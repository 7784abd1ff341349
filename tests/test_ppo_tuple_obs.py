"""PPO with pytree (tuple) observations — the ``tactile_map`` obs layout.

The reference's VecNormalize only handles flat Box observations, so its PPO
cannot train on TactilePush's (image, state) tuple obs without modification.
Our PPO builds a pytree of RunningMeanStd filters matching the obs structure
(algorithms/ppo.py rms_tree_*), so tuple obs normalize/update/minibatch
end-to-end. Pinned here on (a) the helper level and (b) a full PPO update
on a tuple-obs env with a CNN actor-critic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.algorithms.ppo import (
    rms_tree_create, rms_tree_normalize, rms_tree_update)


def test_rms_tree_helpers_match_numpy():
    dummy = (jnp.zeros((2, 3, 4)), jnp.zeros((5,)))
    rms = rms_tree_create(dummy, jnp.float64)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    b1 = (jax.random.normal(k1, (16, 2, 3, 4), jnp.float64) * 2.0 + 1.0,
          jax.random.normal(k2, (16, 5), jnp.float64) * 0.5 - 3.0)
    rms = rms_tree_update(rms, b1)
    b2 = jax.tree.map(lambda x: x + 1.0, b1)
    rms = rms_tree_update(rms, b2)
    allb = jax.tree.map(lambda a, b: np.concatenate([a, b]), b1, b2)
    for r, ab in zip(rms, allb):
        np.testing.assert_allclose(np.asarray(r.mean), ab.mean(axis=0),
                                   rtol=1e-6, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r.var), ab.var(axis=0),
                                   rtol=1e-4, atol=1e-3)
    normed = rms_tree_normalize(rms, jax.tree.map(lambda x: x[0], b1), 10.0)
    assert normed[0].shape == (2, 3, 4) and normed[1].shape == (5,)
    assert all(np.all(np.abs(np.asarray(x)) <= 10.0) for x in normed)


def test_int_logstd_init_yields_float_param():
    """YAML configs write ``actor_logstd_init: 0`` (int) — the reference
    ppo_tactile.yaml does exactly this; the param must still be
    differentiable (float), or PPO's value_and_grad dies with an int32
    input error (hit on the first real TactilePush PPO run)."""
    from tactilesimulation_tpu.models import nets
    cfg = {"actor_mlp": {"layer_sizes": [8], "activation": "elu"},
           "actor_logstd_init": 0,
           "critic_mlp": {"layer_sizes": [8], "activation": "elu"}}
    ac = nets.ActorCritic(2, cfg)
    params = ac.init(jax.random.PRNGKey(0), jnp.zeros(3))
    logstd = params["params"]["actor"]["logstd"]
    assert jnp.issubdtype(logstd.dtype, jnp.floating), logstd.dtype


class _TupleObsEnv:
    """Pendulum with obs re-emitted as an (image, state) tuple — the
    tactile_map observation contract (envs/tactile_push.py:95)."""

    def __init__(self, env):
        self.env = env
        self.max_episode_steps = env.max_episode_steps
        self.ndof_u = env.ndof_u

    def _wrap(self, obs):
        img = obs.reshape((1, 1) + obs.shape[-1:])   # (C=1, H=1, W=obs_dim)
        return (img, obs)

    def reset(self, key):
        state, obs = self.env.reset(key)
        return state, self._wrap(obs)

    def step(self, state, action):
        state, obs, r, d, info = self.env.step(state, action)
        return state, self._wrap(obs), r, d, info


@pytest.mark.slow
def test_ppo_tuple_obs_full_update():
    from tactilesimulation_tpu.algorithms.ppo import PPO
    from tactilesimulation_tpu.envs import pendulum

    base = pendulum.make()
    base.max_episode_steps = 16
    env = _TupleObsEnv(base)
    cfg = {
        "network": {"actor": "CNNActor",
                    "actor_cnn": {"layer_sizes": [4], "kernel_sizes": [1],
                                  "stride_sizes": [1], "hidden_size": 8,
                                  "activation": "elu"},
                    "actor_logstd_init": 0.0,
                    "critic": "CNNCritic",
                    "critic_cnn": {"layer_sizes": [4], "kernel_sizes": [1],
                                   "stride_sizes": [1], "hidden_size": 8,
                                   "activation": "elu"}},
        "config": {"num_env_steps": 2 * 16 * 4, "num_steps": 16,
                   "num_processes": 4, "lr": 3e-4, "ppo_epoch": 2,
                   "num_mini_batch": 2},
    }
    algo = PPO(env, cfg, logdir=None, seed=0)
    mean_r = algo.train()
    assert np.isfinite(mean_r)
    r, length, info = algo.play_once()
    assert np.isfinite(r)
