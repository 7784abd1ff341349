"""Policy/value network zoo (flax.linen) — parity with the reference
utils/model.py (P13): MLP, CNN, DiagGaussianActor, CNNActor, CNNCritic,
MLPCritic, ActorCritic, ActorCriticRNN — configured by the same YAML network
sections (layer_sizes / kernel_sizes / stride_sizes / hidden_size /
activation / layernorm / actor_logstd_init / rnn_hidden_*)."""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACT = {"tanh": nn.tanh, "relu": nn.relu, "elu": nn.elu,
        "identity": lambda x: x}


def _activation(cfg):
    return _ACT[cfg.get("activation", "elu")]


class MLP(nn.Module):
    cfg: Dict[str, Any]

    @nn.compact
    def __call__(self, x):
        act = _activation(self.cfg)
        for size in self.cfg["layer_sizes"]:
            x = nn.Dense(size)(x)
            x = act(x)
            if self.cfg.get("layernorm", False):
                x = nn.LayerNorm()(x)
        return x


class CNN(nn.Module):
    """Conv stack + flatten + linear (reference utils/model.py:37-67).
    Input (..., C, H, W) — channel-first like the reference tactile maps."""
    cfg: Dict[str, Any]

    @nn.compact
    def __call__(self, x):
        act = _activation(self.cfg)
        x = jnp.moveaxis(x, -3, -1)  # to NHWC for lax conv defaults
        for feat, k, s in zip(self.cfg["layer_sizes"],
                              self.cfg["kernel_sizes"],
                              self.cfg["stride_sizes"]):
            x = nn.Conv(feat, (k, k), strides=(s, s), padding="VALID")(x)
            x = act(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.Dense(self.cfg["hidden_size"])(x)
        return act(x)


class DiagGaussianDist:
    """Diagonal Gaussian action distribution (reference FixedNormal)."""

    def __init__(self, mean, logstd):
        self.mean = mean
        self.logstd = jnp.broadcast_to(logstd, mean.shape)

    def mode(self):
        return self.mean

    def sample(self, key):
        return self.mean + jnp.exp(self.logstd) * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def log_prob(self, actions):
        std = jnp.exp(self.logstd)
        lp = (-0.5 * ((actions - self.mean) / std) ** 2
              - self.logstd - 0.5 * jnp.log(2.0 * jnp.pi))
        return jnp.sum(lp, axis=-1, keepdims=True)

    def entropy(self):
        return jnp.sum(self.logstd + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e),
                       axis=-1)


class DiagGaussianActor(nn.Module):
    """MLP actor with state-independent learned logstd
    (reference utils/model.py:123-151)."""
    action_dim: int
    cfg: Dict[str, Any]

    @nn.compact
    def __call__(self, obs):
        feat = MLP(self.cfg["actor_mlp"])(obs)
        mean = nn.Dense(self.action_dim)(feat)
        logstd = self.param(
            "logstd",
            lambda _k, shape: jnp.full(shape, float(self.cfg.get(
                "actor_logstd_init", -1.0))), (self.action_dim,))
        return DiagGaussianDist(mean, logstd)

    def act(self, obs, key=None, deterministic=True):
        dist = self(obs)
        return dist.mode() if deterministic else dist.sample(key)


class CNNActor(nn.Module):
    """CNN actor for tactile_map observations: (image, state) tuple obs
    (reference utils/model.py:69-96 takes image only; the state vector is
    concatenated post-CNN here, matching the mixed_observation_space use)."""
    action_dim: int
    cfg: Dict[str, Any]

    @nn.compact
    def __call__(self, obs):
        img, state = obs if isinstance(obs, tuple) else (obs, None)
        feat = CNN(self.cfg["actor_cnn"])(img)
        if state is not None:
            feat = jnp.concatenate([feat, state], axis=-1)
        mean = nn.Dense(self.action_dim)(feat)
        logstd = self.param(
            "logstd",
            lambda _k, shape: jnp.full(shape, float(self.cfg.get(
                "actor_logstd_init", -1.0))), (self.action_dim,))
        return DiagGaussianDist(mean, logstd)

    def act(self, obs, key=None, deterministic=True):
        dist = self(obs)
        return dist.mode() if deterministic else dist.sample(key)


class MLPCritic(nn.Module):
    cfg: Dict[str, Any]

    @nn.compact
    def __call__(self, obs):
        feat = MLP(self.cfg["critic_mlp"])(obs)
        return nn.Dense(1)(feat)


class CNNCritic(nn.Module):
    cfg: Dict[str, Any]

    @nn.compact
    def __call__(self, obs):
        img, state = obs if isinstance(obs, tuple) else (obs, None)
        feat = CNN(self.cfg["critic_cnn"])(img)
        if state is not None:
            feat = jnp.concatenate([feat, state], axis=-1)
        return nn.Dense(1)(feat)


class ActorCritic(nn.Module):
    """Feed-forward actor-critic pair (reference utils/model.py:168-211)."""
    action_dim: int
    cfg: Dict[str, Any]
    actor_cls: str = "DiagGaussianActor"
    critic_cls: str = "MLPCritic"

    def setup(self):
        actor_map = {"DiagGaussianActor": DiagGaussianActor,
                     "CNNActor": CNNActor}
        critic_map = {"MLPCritic": MLPCritic, "CNNCritic": CNNCritic}
        self.actor = actor_map[self.actor_cls](self.action_dim, self.cfg)
        self.critic = critic_map[self.critic_cls](self.cfg)

    def __call__(self, obs):
        return self.actor(obs), self.critic(obs)

    def act(self, obs, key, deterministic=False):
        dist, value = self(obs)
        action = dist.mode() if deterministic else dist.sample(key)
        return value, action, dist.log_prob(action)

    def get_value(self, obs):
        return self.critic(obs)

    def evaluate_actions(self, obs, actions):
        dist, value = self(obs)
        return value, dist.log_prob(actions), dist.entropy().mean()


class GRUCell(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, h, x):
        return nn.GRUCell(self.hidden)(h, x)


class ActorCriticRNN(nn.Module):
    """CNN -> stacked GRU -> actor/critic (reference utils/model.py:213-330).

    Hidden state layout: (layers, hidden) flattened to (layers*hidden,) for
    storage parity with the reference's recurrent_hidden_state_size.
    With ``feature_mlp`` instead of ``feature_cnn`` in the config this is the
    reference's ActorCriticMLPRNN (utils/model.py:332-449)."""
    action_dim: int
    cfg: Dict[str, Any]

    def setup(self):
        if "feature_mlp" in self.cfg:
            self.feature_net = MLP(self.cfg["feature_mlp"])
        else:
            self.feature_net = CNN(self.cfg["feature_cnn"])
        self.hidden = self.cfg["rnn_hidden_size"]
        self.layers = self.cfg["rnn_hidden_layers"]
        self.cells = [nn.GRUCell(self.hidden, name=f"gru{i}")
                      for i in range(self.layers)]
        self.actor = DiagGaussianActor(self.action_dim, self.cfg)
        self.critic = MLPCritic(self.cfg)

    def initial_hidden(self, dtype=jnp.float32):
        return jnp.zeros((self.layers * self.hidden,), dtype)

    def _rnn(self, feat, hxs, mask):
        """One step: hxs (layers*hidden,), mask () resets hidden when 0."""
        h = (hxs * mask).reshape(self.layers, self.hidden)
        x = feat
        new_h = []
        for i, cell in enumerate(self.cells):
            hi, x = cell(h[i], x)
            new_h.append(hi)
        return x, jnp.stack(new_h).reshape(-1)

    def __call__(self, obs, hxs, mask):
        feat = self.feature_net(obs)
        out, new_hxs = self._rnn(feat, hxs, mask)
        return self.actor(out), self.critic(out), new_hxs

    def act(self, obs, hxs, mask, key, deterministic=False):
        dist, value, new_hxs = self(obs, hxs, mask)
        action = dist.mode() if deterministic else dist.sample(key)
        return value, action, dist.log_prob(action), new_hxs

    def get_value(self, obs, hxs, mask):
        _, value, _ = self(obs, hxs, mask)
        return value

    def evaluate_actions(self, obs, hxs, mask, actions):
        dist, value, new_hxs = self(obs, hxs, mask)
        return value, dist.log_prob(actions), dist.entropy(), new_hxs


#: reference name alias (utils/model.py:332) — same module, MLP features
ActorCriticMLPRNN = ActorCriticRNN
