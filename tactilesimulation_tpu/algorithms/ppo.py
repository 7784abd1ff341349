"""PPO: model-free path with vmapped batched envs.

TPU-native restructuring of the reference PPO stack (algorithms/ppo.py +
externals/pytorch-a2c-ppo-acktr-gail, SURVEY.md P11/E1-E3): the 8-process
SubprocVecEnv becomes a vmapped env batch on-device, the RolloutStorage +
GAE becomes a lax.scan, and one training iteration (rollout -> returns ->
ppo_epochs x minibatches) is a single jitted program.

Feature parity (reference file:line):
- clipped surrogate + clipped value loss + entropy, minibatched epochs,
  grad clipping (a2c_ppo_acktr/algo/ppo.py:34-96)
- GAE with proper-time-limit bad_masks: truncated episodes bootstrap from
  the value function instead of zero (storage.py:66-105, envs.py:132-137)
- obs/return running normalization with clipping (envs.py:206-227)
- linear lr decay (utils.py:45-49), logging/ckpt/eval (ppo.py:192-265)
- auto-reset vectorized envs (SubprocVecEnv semantics)
"""

from __future__ import annotations

import os
import pickle
import time
from collections import deque
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct as fstruct

from ..models import nets
from ..utils import logging as log
from ..utils.running_mean_std import RunningMeanStd


@fstruct.dataclass
class VecEnvState:
    env_states: Any          # vmapped EnvState batch
    obs: Any                 # (N, obs...)
    t: jnp.ndarray           # (N,) per-env step counts
    key: jax.Array


@fstruct.dataclass
class NormState:
    obs_rms: Any             # pytree of RunningMeanStd matching the obs pytree
    ret_rms: RunningMeanStd
    returns: jnp.ndarray     # (N,) discounted return accumulator


def _is_rms(x):
    return isinstance(x, RunningMeanStd)


def rms_tree_create(dummy_obs, dtype):
    """One RunningMeanStd per obs leaf — supports tuple observations like
    TactilePush ``tactile_map``'s (image, state) pair (reference VecNormalize
    only handles flat Boxes; this generalizes it)."""
    return jax.tree.map(
        lambda o: RunningMeanStd.create(jnp.shape(o), dtype), dummy_obs)


def rms_tree_update(rms_tree, batch):
    return jax.tree.map(lambda r, b: r.update(b), rms_tree, batch,
                        is_leaf=_is_rms)


def rms_tree_normalize(rms_tree, obs, clip):
    return jax.tree.map(
        lambda r, o: jnp.clip(r.normalize(o), -clip, clip), rms_tree, obs,
        is_leaf=_is_rms)


class PPO:
    def __init__(self, env, cfg: Dict[str, Any], logdir: Optional[str] = None,
                 seed: int = 0):
        self.env = env
        self.cfg = cfg
        config = cfg.get("config", {})
        network = cfg.get("network", {})
        self.logdir = logdir
        self.seed = seed

        self.num_processes = config.get("num_processes", 8)
        self.num_steps = config.get("num_steps", 1024)
        self.num_env_steps = config.get("num_env_steps", 2_000_000)
        self.lr = config.get("lr", 3e-4)
        self.clip_param = config.get("clip_param", 0.2)
        self.ppo_epoch = config.get("ppo_epoch", 10)
        self.num_mini_batch = config.get("num_mini_batch", 32)
        self.value_loss_coef = config.get("value_loss_coef", 0.5)
        self.entropy_coef = config.get("entropy_coef", 0.0)
        self.max_grad_norm = config.get("max_grad_norm", 0.5)
        self.gamma = config.get("gamma", 0.99)
        self.gae_lambda = config.get("gae_lambda", 0.95)
        self.use_linear_lr_decay = config.get("use_linear_lr_decay", True)
        self.use_proper_time_limits = config.get("use_proper_time_limits", True)
        self.norm_obs = config.get("norm_obs", True)
        self.norm_reward = config.get("norm_reward", True)
        self.clip_obs = config.get("clip_obs", 10.0)
        self.clip_reward = config.get("clip_reward", 10.0)
        # interval checkpointing (reference ppo.py:100,192-199 —
        # save_interval default 50); here each interval ALSO writes a
        # full-state checkpoint so a crashed run resumes exactly (§5.4)
        self.save_interval = cfg.get("general", {}).get(
            "save_interval", config.get("save_interval", 50))

        self.num_updates = self.num_env_steps // (
            self.num_steps * self.num_processes)
        self._resume_blob = None

        actor_cls = network.get("actor", "DiagGaussianActor")
        critic_cls = network.get("critic", "MLPCritic")
        self.ac = nets.ActorCritic(env.ndof_u, network, actor_cls, critic_cls)
        key = jax.random.PRNGKey(seed)
        # infer the obs pytree (flat vector OR tuple obs like tactile_map's
        # (image, state)) from the env itself — no shape bookkeeping
        obs_sd = jax.eval_shape(env.reset, jax.random.PRNGKey(0))[1]
        dummy_obs = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), obs_sd)
        self.params = self.ac.init(key, dummy_obs)

        sched = (optax.linear_schedule(
            self.lr, 0.0, self.num_updates * self.ppo_epoch
            * self.num_mini_batch) if self.use_linear_lr_decay else self.lr)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.adam(sched, eps=1e-5))
        self.opt_state = self.optimizer.init(self.params)

        dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.norm = NormState(
            obs_rms=rms_tree_create(dummy_obs, dt),
            ret_rms=RunningMeanStd.create((), dt),
            returns=jnp.zeros(self.num_processes, dt))
        self._build()

    # ------------------------------------------------------------------
    def _build(self):
        env, ac = self.env, self.ac
        N, T = self.num_processes, self.num_steps

        def norm_obs(rms, obs):
            if not self.norm_obs:
                return obs
            return rms_tree_normalize(rms, obs, self.clip_obs)

        def vec_reset(key):
            keys = jax.random.split(key, N)
            states, obs = jax.vmap(env.reset)(keys)
            return states, obs

        def env_step_autoreset(state, obs, t, action, key):
            """One env step with SubprocVecEnv auto-reset semantics."""
            nstate, nobs, reward, done, info = env.step(state, action)
            t = t + 1
            truncated = t >= env.max_episode_steps
            reset_now = done | truncated
            rstate, robs = env.reset(key)
            # this function is vmapped per-env, so reset_now is a scalar and
            # broadcasts over every state/obs leaf
            nstate = jax.tree.map(lambda a, b: jnp.where(reset_now, a, b),
                                  rstate, nstate)
            nobs = jax.tree.map(lambda a, b: jnp.where(reset_now, a, b),
                                robs, nobs)
            t = jnp.where(reset_now, 0, t)
            # bad_mask: 1 if the episode ended by time limit (bootstrap value)
            bad = truncated & ~done
            return nstate, nobs, t, reward, reset_now, bad

        def rollout(params, vec: VecEnvState, norm: NormState):
            def body(carry, _):
                vec, norm = carry
                key, k_act, k_reset = jax.random.split(vec.key, 3)
                nobs = norm_obs(norm.obs_rms, vec.obs)
                value, action, logp = jax.vmap(
                    lambda o, k: ac.apply(params, o, k, method=ac.act),
                    in_axes=(0, None))(nobs, k_act)
                rkeys = jax.random.split(k_reset, N)
                nstate, next_obs, t, reward, done, bad = jax.vmap(
                    env_step_autoreset)(vec.env_states, vec.obs, vec.t,
                                        action, rkeys)
                # return normalization (VecNormalize, envs.py:206-227)
                returns = norm.returns * self.gamma + reward
                new_ret_rms = norm.ret_rms.update(returns)
                if self.norm_reward:
                    r_train = jnp.clip(
                        reward / jnp.sqrt(new_ret_rms.var + 1e-8),
                        -self.clip_reward, self.clip_reward)
                else:
                    r_train = reward
                returns = jnp.where(done, 0.0, returns)
                new_obs_rms = rms_tree_update(norm.obs_rms, vec.obs)
                new_norm = NormState(obs_rms=new_obs_rms, ret_rms=new_ret_rms,
                                     returns=returns)
                new_vec = VecEnvState(env_states=nstate, obs=next_obs, t=t,
                                      key=key)
                out = (nobs, action, logp[:, 0], value[:, 0], r_train,
                       done, bad, reward)
                return (new_vec, new_norm), out

            (vec, norm), outs = jax.lax.scan(body, (vec, norm), None, length=T)
            return vec, norm, outs

        def compute_gae(values, rewards, dones, bads, last_value):
            """(T, N) arrays -> returns & advantages with proper-time-limit
            handling (storage.py:66-105)."""
            masks = 1.0 - dones.astype(values.dtype)          # mask AFTER step t
            bad = bads.astype(values.dtype)

            def body(carry, xs):
                gae = carry
                v, r, mask, b, v_next = xs
                # time-limit truncation: treat as non-terminal bootstrap
                delta = r + self.gamma * v_next * (mask + b * (1 - mask)) - v
                gae = delta + self.gamma * self.gae_lambda * \
                    (mask + b * (1 - mask)) * gae
                return gae, gae

            v_nexts = jnp.concatenate([values[1:], last_value[None]], axis=0)
            _, advs = jax.lax.scan(
                body, jnp.zeros_like(last_value),
                (values, rewards, masks, bad, v_nexts), reverse=True)
            returns = advs + values
            return returns, advs

        def ppo_loss(params, obs, actions, old_logp, old_values, returns, advs):
            value, logp, entropy = jax.vmap(
                lambda o, a: ac.apply(params, o, a,
                                      method=ac.evaluate_actions))(obs, actions)
            value, logp = value[:, 0], logp[:, 0]
            entropy = entropy.mean()
            ratio = jnp.exp(logp - old_logp)
            surr1 = ratio * advs
            surr2 = jnp.clip(ratio, 1 - self.clip_param,
                             1 + self.clip_param) * advs
            action_loss = -jnp.minimum(surr1, surr2).mean()
            v_clipped = old_values + jnp.clip(
                value - old_values, -self.clip_param, self.clip_param)
            v_loss = 0.5 * jnp.maximum((value - returns) ** 2,
                                       (v_clipped - returns) ** 2).mean()
            loss = (action_loss + self.value_loss_coef * v_loss
                    - self.entropy_coef * entropy)
            return loss, (action_loss, v_loss, entropy)

        def update_iteration(params, opt_state, vec, norm, key):
            vec, norm, outs = rollout(params, vec, norm)
            obs, actions, logps, values, rewards, dones, bads, raw_r = outs
            last_nobs = norm_obs(norm.obs_rms, vec.obs)
            last_value = jax.vmap(
                lambda o: ac.apply(params, o, method=ac.get_value))(
                    last_nobs)[:, 0]
            returns, advs = compute_gae(values, rewards, dones, bads,
                                        last_value)
            advs_n = (advs - advs.mean()) / (advs.std() + 1e-5)

            # flatten (T, N, ...) -> (T*N, ...)
            flat = jax.tree.map(
                lambda x: x.reshape((T * N,) + x.shape[2:]),
                (obs, actions, logps, values, returns, advs_n))
            B = T * N
            mb = B // self.num_mini_batch

            def epoch_body(carry, ek):
                params, opt_state = carry
                perm = jax.random.permutation(ek, B)

                def mb_body(carry, idx):
                    params, opt_state = carry
                    batch = jax.tree.map(lambda x: x[idx], flat)
                    (loss, aux), grads = jax.value_and_grad(
                        ppo_loss, has_aux=True)(params, *batch)
                    updates, opt_state = self.optimizer.update(
                        grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), (loss, *aux)

                idxs = perm[:self.num_mini_batch * mb].reshape(
                    self.num_mini_batch, mb)
                (params, opt_state), metrics = jax.lax.scan(
                    mb_body, (params, opt_state), idxs)
                return (params, opt_state), metrics

            ekeys = jax.random.split(key, self.ppo_epoch)
            (params, opt_state), metrics = jax.lax.scan(
                epoch_body, (params, opt_state), ekeys)
            mean_metrics = jax.tree.map(jnp.mean, metrics)
            return (params, opt_state, vec, norm, mean_metrics,
                    raw_r, dones)

        self._vec_reset = jax.jit(vec_reset)
        self._update = jax.jit(update_iteration, donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------
    def train(self, stop_update: Optional[int] = None):
        """Run updates [resumed-update, num_updates); ``stop_update``
        truncates early (checkpoint/resume tests simulate a crash with it).
        A full-state checkpoint is written every ``save_interval`` updates
        AND when the loop exits, so a TPU worker crash loses at most one
        interval (reference saves models only, ppo.py:192-199)."""
        end_update = (self.num_updates if stop_update is None
                      else min(stop_update, self.num_updates))
        writer = log.SummaryWriter(os.path.join(self.logdir, "log")) \
            if self.logdir else None
        textlog = log.TextLog(os.path.join(self.logdir, "logs.txt")) \
            if self.logdir else None
        if self._resume_blob is not None:
            blob = self._resume_blob
            self._resume_blob = None
            key = jnp.asarray(blob["key"], jnp.uint32)
            vec, norm = blob["vec"], blob["norm"]
            update0 = int(blob["update"])
            episode_rewards = deque(
                [float(x) for x in np.atleast_1d(blob["episode_rewards"])],
                maxlen=100)
            ep_acc = np.asarray(blob["ep_acc"], np.float64).copy()
            best = float(blob["best"])
            elapsed0 = float(blob["elapsed"])
        else:
            key = jax.random.PRNGKey(self.seed)
            key, kr = jax.random.split(key)
            states, obs = self._vec_reset(kr)
            vec = VecEnvState(env_states=states, obs=obs,
                              t=jnp.zeros(self.num_processes, jnp.int32),
                              key=key)
            norm = self.norm
            update0 = 0
            episode_rewards = deque(maxlen=100)
            ep_acc = np.zeros(self.num_processes)
            best = -np.inf
            elapsed0 = 0.0

        t_start = time.time()
        mean_r = -np.inf
        for update in range(update0, end_update):
            key, ku = jax.random.split(key)
            (self.params, self.opt_state, vec, norm, metrics, raw_r,
             dones) = self._update(self.params, self.opt_state, vec, norm, ku)
            raw_r = np.asarray(raw_r)      # (T, N)
            dones_np = np.asarray(dones)
            for t in range(raw_r.shape[0]):
                ep_acc += raw_r[t]
                for i in np.nonzero(dones_np[t])[0]:
                    episode_rewards.append(ep_acc[i])
                    ep_acc[i] = 0.0
            total_steps = (update + 1) * self.num_steps * self.num_processes
            if len(episode_rewards) > 0:
                mean_r = float(np.mean(episode_rewards))
                fps = int((total_steps
                           - update0 * self.num_steps * self.num_processes)
                          / (time.time() - t_start))
                loss, aloss, vloss, ent = (float(np.asarray(m))
                                           for m in metrics)
                msg = (f"Updates {update}, num timesteps {total_steps}, "
                       f"FPS {fps} | mean/median reward "
                       f"{mean_r:.1f}/{float(np.median(episode_rewards)):.1f} "
                       f"| value_loss {vloss:.4f} action_loss {aloss:.4f} "
                       f"entropy {ent:.2f}")
                print(msg)
                if textlog:
                    textlog.append(msg)
                if writer:
                    writer.add_scalar("rewards/step", mean_r, total_steps)
                    writer.add_scalar("losses/value", vloss, total_steps)
                    writer.add_scalar("losses/action", aloss, total_steps)
                    writer.add_scalar("losses/entropy", ent, total_steps)
                    writer.flush()
                if self.logdir and mean_r > best:
                    best = mean_r
                    self.norm = norm
                    self.save()
            hit_interval = (update % self.save_interval == 0
                            or update == end_update - 1)
            if self.logdir and hit_interval:
                if len(episode_rewards) > 0:
                    self.norm = norm
                    self.save(f"model_iter{update}_reward{mean_r:.1f}")
                self._stash(vec, norm, key, update + 1, episode_rewards,
                            ep_acc, best, elapsed0 + time.time() - t_start)
                self.save_checkpoint()
        self.norm = norm
        self._stash(vec, norm, key, end_update, episode_rewards, ep_acc,
                    best, elapsed0 + time.time() - t_start)
        if self.logdir:
            self.save_checkpoint()
            if end_update >= self.num_updates:
                self.save("final_policy")
        if writer:
            writer.close()
        return float(np.mean(episode_rewards)) if episode_rewards else 0.0

    # -- full-state checkpoint / resume (upgrade over the reference, which
    # loses optimizer + vec-env + normalizer state on restart — §5.4) -------
    def _stash(self, vec, norm, key, update, episode_rewards, ep_acc, best,
               elapsed):
        # fixed-size NaN-padded reward window so the checkpoint treedef /
        # leaf shapes are update-independent (orbax item-restore needs that)
        window = np.full(100, np.nan)
        vals = list(episode_rewards)
        if vals:
            window[:len(vals)] = vals
        self._train_state = {
            "vec": vec, "norm": norm, "key": key, "update": update,
            "episode_rewards": window,
            "ep_acc": np.asarray(ep_acc, np.float64),
            "best": float(best), "elapsed": float(elapsed)}

    def save_checkpoint(self, name: str = "checkpoint"):
        from ..utils import checkpoint
        checkpoint.save_state(
            os.path.join(self.logdir, name),
            {"params": self.params, "opt_state": self.opt_state,
             **self._train_state})

    def _resume_target(self):
        key = jax.random.PRNGKey(0)
        states, obs = self._vec_reset(key)
        vec_t = VecEnvState(env_states=states, obs=obs,
                            t=jnp.zeros(self.num_processes, jnp.int32),
                            key=key)
        return {"params": self.params,
                "opt_state": self.optimizer.init(self.params),
                "vec": vec_t, "norm": self.norm, "key": key, "update": 0,
                "episode_rewards": np.full(100, np.nan),
                "ep_acc": np.zeros(self.num_processes), "best": 0.0,
                "elapsed": 0.0}

    def resume(self, path):
        """Restore params/opt_state/vec-env/normalizer/update counter/PRNG
        key; a subsequent train() continues exactly where the checkpointed
        run stopped (mid-episode env states included)."""
        from ..utils import checkpoint
        blob = checkpoint.restore_state(path, self._resume_target())
        as_jnp = lambda t: jax.tree.map(jnp.asarray, t)
        self.params = as_jnp(blob["params"])
        self.opt_state = as_jnp(blob["opt_state"])
        self.norm = blob["norm"] = as_jnp(blob["norm"])
        blob["vec"] = as_jnp(blob["vec"])
        window = np.asarray(blob["episode_rewards"], np.float64)
        blob["episode_rewards"] = window[~np.isnan(window)]
        self._resume_blob = blob

    # ------------------------------------------------------------------
    def save(self, filename=None):
        os.makedirs(os.path.join(self.logdir, "models"), exist_ok=True)
        path = os.path.join(self.logdir, "models",
                            f"{filename or 'best_model'}.pkl")
        with open(path, "wb") as fp:
            pickle.dump({"params": jax.tree.map(np.asarray, self.params),
                         "obs_rms": jax.tree.map(np.asarray, self.norm.obs_rms)},
                        fp)

    def load(self, path):
        with open(path, "rb") as fp:
            blob = pickle.load(fp)
        self.params = jax.tree.map(jnp.asarray, blob["params"])
        if blob.get("obs_rms") is not None:
            self.norm = self.norm.replace(
                obs_rms=jax.tree.map(jnp.asarray, blob["obs_rms"]))

    def play_once(self, key=None, deterministic=True):
        key = key if key is not None else jax.random.PRNGKey(self.seed + 1)
        key, kr = jax.random.split(key)
        state, obs = jax.jit(self.env.reset)(kr)
        step = jax.jit(self.env.step)
        total, t, done = 0.0, 0, False
        info = {}
        while not done and t < self.env.max_episode_steps:
            nobs = obs
            if self.norm_obs:
                nobs = rms_tree_normalize(self.norm.obs_rms, obs,
                                          self.clip_obs)
            action = self.ac.apply(self.params, nobs, None, True,
                                   method=self.ac.act)[1]
            state, obs, reward, done, info = step(state, action)
            total += float(reward)
            t += 1
            done = bool(done)
        return total, t, {k: np.asarray(v) for k, v in info.items()}
