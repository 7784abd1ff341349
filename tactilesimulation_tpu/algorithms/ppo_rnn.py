"""Recurrent PPO (CNN->GRU actor-critic) — reference algorithms/ppo_rnn.py
(P12) + the recurrent minibatch generator (storage.py:145-202).

Structure follows ppo.py but the policy carries GRU hidden state: rollouts
record per-step hidden states + masks; updates replay whole sequences per
env-minibatch (mask-segmented, so hidden state resets at episode boundaries
exactly as in collection). Success rate is tracked as the model-selection
metric (reference ppo_rnn.py:202-260).
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
from .ppo import NormState, VecEnvState


class PPORNN:
    def __init__(self, env, cfg: Dict[str, Any], logdir: Optional[str] = None,
                 seed: int = 0):
        self.env = env
        self.cfg = cfg
        config = cfg.get("config", {})
        network = cfg.get("network", {})
        self.logdir = logdir
        self.seed = seed

        self.num_processes = config.get("num_processes", 8)
        self.num_steps = config.get("num_steps", 512)
        self.num_env_steps = config.get("num_env_steps", 5_000_000)
        self.lr = config.get("lr", 3e-4)
        self.clip_param = config.get("clip_param", 0.2)
        self.ppo_epoch = config.get("ppo_epoch", 10)
        self.num_mini_batch = config.get("num_mini_batch", 8)
        self.value_loss_coef = config.get("value_loss_coef", 0.5)
        self.entropy_coef = config.get("entropy_coef", 0.0)
        self.max_grad_norm = config.get("max_grad_norm", 0.5)
        self.gamma = config.get("gamma", 0.99)
        self.gae_lambda = config.get("gae_lambda", 0.95)
        self.norm_obs = config.get("norm_obs", True)
        self.norm_reward = config.get("norm_reward", True)
        self.clip_obs = config.get("clip_obs", 10.0)
        self.clip_reward = config.get("clip_reward", 10.0)
        self.num_updates = self.num_env_steps // (
            self.num_steps * self.num_processes)
        # interval + full-state checkpointing (reference ppo_rnn.py:95,
        # 188-195 saves models every save_interval; the full-state
        # checkpoint is the §5.4 upgrade that makes crashes resumable)
        self.save_interval = cfg.get("general", {}).get(
            "save_interval", config.get("save_interval", 50))
        self._resume_blob = None

        self.ac = nets.ActorCriticRNN(env.ndof_u, network)
        obs_shape = env.obs_size()
        key = jax.random.PRNGKey(seed)
        dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.hidden_size = (network["rnn_hidden_size"]
                            * network["rnn_hidden_layers"])
        dummy_obs = jnp.zeros(obs_shape, dt)
        dummy_h = jnp.zeros(self.hidden_size, dt)
        self.params = self.ac.init(key, dummy_obs, dummy_h, jnp.ones((), dt))

        self.optimizer = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.adam(self.lr, eps=1e-5))
        self.opt_state = self.optimizer.init(self.params)
        self.norm = NormState(
            obs_rms=RunningMeanStd.create(obs_shape, dt),
            ret_rms=RunningMeanStd.create((), dt),
            returns=jnp.zeros(self.num_processes, dt))
        self._build()

    # ------------------------------------------------------------------
    def _build(self):
        env, ac = self.env, self.ac
        N, T = self.num_processes, self.num_steps
        assert N % self.num_mini_batch == 0, \
            "recurrent minibatches split whole envs (storage.py:149-153)"

        def norm_obs(rms, obs):
            if not self.norm_obs:
                return obs
            return jnp.clip(rms.normalize(obs), -self.clip_obs, self.clip_obs)

        # a lane-major vec env (e.g. envs/tactile_insertion_lanes.py) fuses
        # the whole-batch step + auto-reset into one call — the vmap fallback
        # pays the per-env step AND reset branch every step
        fused_vec = hasattr(env, "vec_step_autoreset")

        def vec_reset(key):
            keys = jax.random.split(key, N)
            if fused_vec:
                return env.vec_reset(keys)
            states, obs = jax.vmap(env.reset)(keys)
            return states, obs

        def env_step_autoreset(state, obs, t, action, key):
            nstate, nobs, reward, done, info = env.step(state, action)
            t = t + 1
            truncated = t >= env.max_episode_steps
            reset_now = done | truncated
            rstate, robs = env.reset(key)
            nstate = jax.tree.map(lambda a, b: jnp.where(reset_now, a, b),
                                  rstate, nstate)
            nobs = jax.tree.map(lambda a, b: jnp.where(reset_now, a, b),
                                robs, nobs)
            t = jnp.where(reset_now, 0, t)
            success = info.get("success", jnp.zeros((), bool))
            return nstate, nobs, t, reward, reset_now, truncated & ~done, success

        def rollout(params, vec: VecEnvState, hxs, masks, norm: NormState):
            """hxs: (N, H); masks: (N,) 1 = episode continuing."""
            def body(carry, _):
                vec, hxs, masks, norm = carry
                key, k_act, k_reset = jax.random.split(vec.key, 3)
                nobs = norm_obs(norm.obs_rms, vec.obs)
                value, action, logp, new_hxs = jax.vmap(
                    lambda o, h, m, k: ac.apply(params, o, h, m, k,
                                                method=ac.act),
                    in_axes=(0, 0, 0, None))(nobs, hxs, masks, k_act)
                rkeys = jax.random.split(k_reset, N)
                if fused_vec:
                    (nstate, next_obs, t, reward, done, bad,
                     success) = env.vec_step_autoreset(
                        vec.env_states, vec.obs, vec.t, action, rkeys)
                else:
                    nstate, next_obs, t, reward, done, bad, success = \
                        jax.vmap(env_step_autoreset)(
                            vec.env_states, vec.obs, vec.t, action, rkeys)
                returns = norm.returns * self.gamma + reward
                new_ret_rms = norm.ret_rms.update(returns)
                r_train = (jnp.clip(reward / jnp.sqrt(new_ret_rms.var + 1e-8),
                                    -self.clip_reward, self.clip_reward)
                           if self.norm_reward else reward)
                returns = jnp.where(done, 0.0, returns)
                new_norm = NormState(obs_rms=norm.obs_rms.update(vec.obs),
                                     ret_rms=new_ret_rms, returns=returns)
                new_masks = 1.0 - done.astype(hxs.dtype)
                out = (nobs, masks, action, logp[:, 0], value[:, 0], r_train,
                       done, bad, reward, success)
                return (VecEnvState(env_states=nstate, obs=next_obs, t=t,
                                    key=key), new_hxs, new_masks, new_norm), out

            (vec, hxs, masks, norm), outs = jax.lax.scan(
                body, (vec, hxs, masks, norm), None, length=T)
            return vec, hxs, masks, norm, outs

        def compute_gae(values, rewards, dones, bads, last_value):
            masks = 1.0 - dones.astype(values.dtype)
            bad = bads.astype(values.dtype)

            def body(gae, xs):
                v, r, mask, b, v_next = xs
                cont = mask + b * (1 - mask)
                delta = r + self.gamma * v_next * cont - v
                gae = delta + self.gamma * self.gae_lambda * cont * gae
                return gae, gae

            v_nexts = jnp.concatenate([values[1:], last_value[None]], axis=0)
            _, advs = jax.lax.scan(body, jnp.zeros_like(last_value),
                                   (values, rewards, masks, bad, v_nexts),
                                   reverse=True)
            return advs + values, advs

        def sequence_loss(params, obs_seq, mask_seq, act_seq, old_logp,
                          old_values, returns, advs, h0):
            """Replay one env's full T sequence through the RNN.
            obs_seq (T, obs...), h0 (H,)."""
            def body(h, xs):
                o, m, a = xs
                value, logp, entropy, h = ac.apply(
                    params, o, h, m, a, method=ac.evaluate_actions)
                return h, (value[0], logp[0], entropy)

            _, (values, logps, entropies) = jax.lax.scan(
                body, h0, (obs_seq, mask_seq, act_seq))
            ratio = jnp.exp(logps - old_logp)
            surr1 = ratio * advs
            surr2 = jnp.clip(ratio, 1 - self.clip_param,
                             1 + self.clip_param) * advs
            action_loss = -jnp.minimum(surr1, surr2).mean()
            v_clipped = old_values + jnp.clip(values - old_values,
                                              -self.clip_param,
                                              self.clip_param)
            v_loss = 0.5 * jnp.maximum((values - returns) ** 2,
                                       (v_clipped - returns) ** 2).mean()
            ent = entropies.mean()
            return action_loss, v_loss, ent

        def mb_loss(params, batch):
            (obs, mask, act, old_logp, old_values, returns, advs, h0) = batch
            # batch leaves are (T, envs_per_mb, ...) except h0 (envs_per_mb, H)
            a_l, v_l, ent = jax.vmap(
                lambda *xs: sequence_loss(params, *xs),
                in_axes=(1, 1, 1, 1, 1, 1, 1, 0))(
                    obs, mask, act, old_logp, old_values, returns, advs, h0)
            loss = (a_l.mean() + self.value_loss_coef * v_l.mean()
                    - self.entropy_coef * ent.mean())
            return loss, (a_l.mean(), v_l.mean(), ent.mean())

        def update_iteration(params, opt_state, vec, hxs, masks, norm, key):
            h0_all = hxs
            m0_all = masks
            vec, hxs, masks, norm, outs = rollout(params, vec, hxs, masks, norm)
            (obs, mask_seq, actions, logps, values, rewards, dones, bads,
             raw_r, successes) = outs
            # first-step masks come from the pre-rollout state
            mask_seq = jnp.concatenate([m0_all[None], mask_seq[1:]], axis=0)
            last_nobs = norm_obs(norm.obs_rms, vec.obs)
            last_value = jax.vmap(
                lambda o, h, m: ac.apply(params, o, h, m,
                                         method=ac.get_value))(
                last_nobs, hxs, masks)[:, 0]
            returns, advs = compute_gae(values, rewards, dones, bads,
                                        last_value)
            advs_n = (advs - advs.mean()) / (advs.std() + 1e-5)

            envs_per_mb = N // self.num_mini_batch

            def epoch_body(carry, ek):
                params, opt_state = carry
                perm = jax.random.permutation(ek, N)

                def mb_body(carry, env_idx):
                    params, opt_state = carry
                    batch = (obs[:, env_idx], mask_seq[:, env_idx],
                             actions[:, env_idx], logps[:, env_idx],
                             values[:, env_idx], returns[:, env_idx],
                             advs_n[:, env_idx], h0_all[env_idx])
                    (loss, aux), grads = jax.value_and_grad(
                        mb_loss, has_aux=True)(params, batch)
                    updates, opt_state = self.optimizer.update(
                        grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), (loss, *aux)

                idxs = perm.reshape(self.num_mini_batch, envs_per_mb)
                (params, opt_state), metrics = jax.lax.scan(
                    mb_body, (params, opt_state), idxs)
                return (params, opt_state), metrics

            ekeys = jax.random.split(key, self.ppo_epoch)
            (params, opt_state), metrics = jax.lax.scan(
                epoch_body, (params, opt_state), ekeys)
            return (params, opt_state, vec, hxs, masks, norm,
                    jax.tree.map(jnp.mean, metrics), raw_r, dones, successes)

        self._vec_reset = jax.jit(vec_reset)
        self._update = jax.jit(update_iteration, donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------
    def train(self, stop_update: Optional[int] = None):
        """Run updates [resumed-update, num_updates); ``stop_update``
        truncates early (crash-sim tests). A full-state checkpoint (params,
        optimizer, vec-env states, GRU hidden states, normalizer, counters)
        is written every ``save_interval`` updates AND on loop exit, so a
        TPU worker crash loses at most one interval."""
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
            hxs, masks = blob["hxs"], blob["masks"]
            update0 = int(blob["update"])
            episode_rewards = deque(
                [float(x) for x in np.atleast_1d(blob["episode_rewards"])],
                maxlen=100)
            successes = deque(
                [float(x) for x in np.atleast_1d(blob["successes"])],
                maxlen=100)
            ep_acc = np.asarray(blob["ep_acc"], np.float64).copy()
            best_sr = float(blob["best"])
            elapsed0 = float(blob["elapsed"])
        else:
            key = jax.random.PRNGKey(self.seed)
            key, kr = jax.random.split(key)
            states, obs = self._vec_reset(kr)
            dt = obs.dtype
            vec = VecEnvState(env_states=states, obs=obs,
                              t=jnp.zeros(self.num_processes, jnp.int32),
                              key=key)
            hxs = jnp.zeros((self.num_processes, self.hidden_size), dt)
            masks = jnp.zeros(self.num_processes, dt)
            norm = self.norm
            update0 = 0
            episode_rewards = deque(maxlen=100)
            successes = deque(maxlen=100)
            ep_acc = np.zeros(self.num_processes)
            best_sr = -1.0
            elapsed0 = 0.0

        t_start = time.time()
        mean_r, sr = -np.inf, 0.0
        for update in range(update0, end_update):
            key, ku = jax.random.split(key)
            (self.params, self.opt_state, vec, hxs, masks, norm, metrics,
             raw_r, dones, succ) = self._update(
                self.params, self.opt_state, vec, hxs, masks, norm, ku)
            raw_r, dones_np = np.asarray(raw_r), np.asarray(dones)
            succ_np = np.asarray(succ)
            for t in range(raw_r.shape[0]):
                ep_acc += raw_r[t]
                for i in np.nonzero(dones_np[t])[0]:
                    episode_rewards.append(ep_acc[i])
                    successes.append(float(succ_np[t, i]))
                    ep_acc[i] = 0.0
            if len(episode_rewards) > 0:
                total = (update + 1) * self.num_steps * self.num_processes
                sr = float(np.mean(successes)) if successes else 0.0
                mean_r = float(np.mean(episode_rewards))
                fps = int((total
                           - update0 * self.num_steps * self.num_processes)
                          / (time.time() - t_start))
                msg = (f"Updates {update}, steps {total}, FPS {fps} | "
                       f"reward {mean_r:.1f} | success {sr:.3f}")
                print(msg)
                if textlog:
                    textlog.append(msg)
                if writer:
                    writer.add_scalar("rewards/step", mean_r, total)
                    writer.add_scalar("success_rate/step", sr, total)
                    writer.flush()
                # success-rate model selection (ppo_rnn.py:202-260)
                if self.logdir and sr > best_sr and len(successes) >= 10:
                    best_sr = sr
                    self.norm = norm
                    self.save()
            hit_interval = (update % self.save_interval == 0
                            or update == end_update - 1)
            if self.logdir and hit_interval:
                if len(episode_rewards) > 0:
                    self.norm = norm
                    self.save(f"model_iter{update}_sr{sr:.2f}")
                self._stash(vec, hxs, masks, norm, key, update + 1,
                            episode_rewards, successes, ep_acc, best_sr,
                            elapsed0 + time.time() - t_start)
                self.save_checkpoint()
        self.norm = norm
        self._stash(vec, hxs, masks, norm, key, end_update, episode_rewards,
                    successes, ep_acc, best_sr,
                    elapsed0 + time.time() - t_start)
        if self.logdir:
            self.save_checkpoint()
            if end_update >= self.num_updates:
                self.save("final_policy")
        if writer:
            writer.close()
        return float(np.mean(successes)) if successes else 0.0

    # -- full-state checkpoint / resume (§5.4; cf. PPO.save_checkpoint) ----
    def _stash(self, vec, hxs, masks, norm, key, update, episode_rewards,
               successes, ep_acc, best_sr, elapsed):
        def window(vals):
            w = np.full(100, np.nan)
            vals = list(vals)
            if vals:
                w[:len(vals)] = vals
            return w
        self._train_state = {
            "vec": vec, "hxs": hxs, "masks": masks, "norm": norm, "key": key,
            "update": update, "episode_rewards": window(episode_rewards),
            "successes": window(successes),
            "ep_acc": np.asarray(ep_acc, np.float64),
            "best": float(best_sr), "elapsed": float(elapsed)}

    def save_checkpoint(self, name: str = "checkpoint"):
        from ..utils import checkpoint
        checkpoint.save_state(
            os.path.join(self.logdir, name),
            {"params": self.params, "opt_state": self.opt_state,
             **self._train_state})

    def _resume_target(self):
        key = jax.random.PRNGKey(0)
        states, obs = self._vec_reset(key)
        dt = obs.dtype
        vec_t = VecEnvState(env_states=states, obs=obs,
                            t=jnp.zeros(self.num_processes, jnp.int32),
                            key=key)
        return {"params": self.params,
                "opt_state": self.optimizer.init(self.params),
                "vec": vec_t,
                "hxs": jnp.zeros((self.num_processes, self.hidden_size), dt),
                "masks": jnp.zeros(self.num_processes, dt),
                "norm": self.norm, "key": key, "update": 0,
                "episode_rewards": np.full(100, np.nan),
                "successes": np.full(100, np.nan),
                "ep_acc": np.zeros(self.num_processes), "best": 0.0,
                "elapsed": 0.0}

    def resume(self, path):
        """Restore the full training state; a subsequent train() continues
        exactly where the checkpointed run stopped."""
        from ..utils import checkpoint
        blob = checkpoint.restore_state(path, self._resume_target())
        as_jnp = lambda t: jax.tree.map(jnp.asarray, t)
        self.params = as_jnp(blob["params"])
        self.opt_state = as_jnp(blob["opt_state"])
        self.norm = blob["norm"] = as_jnp(blob["norm"])
        blob["vec"] = as_jnp(blob["vec"])
        blob["hxs"] = jnp.asarray(blob["hxs"])
        blob["masks"] = jnp.asarray(blob["masks"])
        for k in ("episode_rewards", "successes"):
            w = np.asarray(blob[k], np.float64)
            blob[k] = w[~np.isnan(w)]
        self._resume_blob = blob

    # ------------------------------------------------------------------
    # Evaluation harness: per-misalignment-class success/improve matrices
    # (the paper's sim-to-real evaluation artifact, reference
    # algorithms/ppo_rnn.py:294-433).
    def play_once(self, key, stochastic=False):
        """One episode with the current policy; returns (total_reward,
        success, improve_cnt, episode_len, extra_info) where extra_info
        carries the 3x3 class count/success/improve matrices and the
        per-step misalignment points/angles."""
        # evaluation replays single episodes — use the per-instance env even
        # when training ran on a lane-major vec env wrapper
        env, ac = getattr(self.env, "env", self.env), self.ac
        if not hasattr(self, "_play_step"):
            def policy_step(params, norm, obs, hxs, k, det):
                nobs = obs
                if self.norm_obs:
                    nobs = jnp.clip(norm.obs_rms.normalize(obs),
                                    -self.clip_obs, self.clip_obs)
                _, action, _, hxs = ac.apply(
                    params, nobs, hxs, jnp.ones((), obs.dtype), k,
                    deterministic=det, method=ac.act)
                return action, hxs
            self._play_step = jax.jit(policy_step, static_argnums=(5,))
            self._env_step = jax.jit(env.step)
            self._env_reset = jax.jit(env.reset)

        key, kr = jax.random.split(key)
        state, obs = self._env_reset(kr)
        dt = obs.dtype if hasattr(obs, "dtype") else jnp.float32
        hxs = jnp.zeros(self.hidden_size, dt)
        class_cnt = np.zeros((3, 3), int)
        class_improve = np.zeros((3, 3), int)
        class_success = np.zeros((3, 3), int)
        points, angles = [], []
        total_reward, improve_cnt, episode_len = 0.0, 0, 0
        success = False
        first_success_step = -1   # 1-based step of FIRST success (-1 = never)
        for _ in range(env.max_episode_steps):
            key, ka = jax.random.split(key)
            action, hxs = self._play_step(self.params, self.norm, obs, hxs,
                                          ka, not stochastic)
            state, obs, reward, done, info = self._env_step(state, action)
            total_reward += float(reward)
            episode_len += 1
            pose = np.asarray(info["prev_object_pose"])
            c1 = 0 if pose[0] < -0.00225 else (1 if pose[0] < 0.00225 else 2)
            c2 = 0 if pose[1] < -0.00225 else (1 if pose[1] < 0.00225 else 2)
            class_cnt[c1][c2] += 1
            points.append(pose[0:2])
            angles.append(np.rad2deg(pose[2]))
            if bool(info["success"]):
                success = True
                if first_success_step < 0:
                    first_success_step = episode_len
                class_success[c1][c2] += 1
            if bool(info["improve"]):
                improve_cnt += 1
                class_improve[c1][c2] += 1
            if bool(done):
                break
        extra = {"class_cnt": class_cnt, "class_improve_cnt": class_improve,
                 "class_success_cnt": class_success, "points": points,
                 "angles": angles,
                 "first_success_step": first_success_step}
        return total_reward, success, improve_cnt, episode_len, extra

    def play(self, num_games=10, stochastic=False, seed=None,
             plot_path=None):
        """Aggregate play_once over episodes; print the per-class matrices
        and (optionally) save the misalignment scatter + angle histogram
        figure (reference ppo_rnn.py:363-433; headless savefig instead of
        plt.show)."""
        key = jax.random.PRNGKey(self.seed + 1 if seed is None else seed)
        agg = {"class_cnt": np.zeros((3, 3), int),
               "class_improve_cnt": np.zeros((3, 3), int),
               "class_success_cnt": np.zeros((3, 3), int)}
        points, angles, steps_to_success = [], [], []
        success_cnt, improve_cnt, episode_len_sum, total_reward = 0, 0, 0, 0.0
        for _ in range(num_games):
            key, k = jax.random.split(key)
            reward, success, imp, ep_len, extra = self.play_once(
                k, stochastic)
            total_reward += reward
            improve_cnt += imp
            if success:
                success_cnt += 1
                episode_len_sum += ep_len
                steps_to_success.append(extra["first_success_step"])
            for name in agg:
                agg[name] += extra[name]
            points += extra["points"]
            angles += extra["angles"]

        n_steps = max(int(agg["class_cnt"].sum()), 1)
        # steps-to-success is the DISCRIMINATIVE insertion metric: episode
        # success saturates under multi-try semantics (a random walk scores
        # 0.8-1.0 — artifacts/README.md baselines: mean 6.0 steps in
        # translation mode), so a trained policy must show FEWER attempts,
        # not just more successes.
        sts_mean = float(np.mean(steps_to_success)) if steps_to_success \
            else float("nan")
        sts_med = float(np.median(steps_to_success)) if steps_to_success \
            else float("nan")
        log.print_info(
            f"[Summary] Avg reward = {total_reward / num_games:.3f}, "
            f"Success rate = {success_cnt / num_games * 100.:.2f}%, "
            f"Steps-to-success mean = {sts_mean:.2f} / median = "
            f"{sts_med:.1f}, "
            f"Improve rate = {improve_cnt / n_steps * 100.:.2f}%")
        for c1 in range(3):
            for c2 in range(3):
                cnt = agg["class_cnt"][c1][c2]
                sr = agg["class_success_cnt"][c1][c2] / max(cnt, 1) * 100.
                ir = agg["class_improve_cnt"][c1][c2] / max(cnt, 1) * 100.
                log.print_info(
                    f"Class [{c1}, {c2}], total cnt = {cnt}, success rate = "
                    f"{sr:.3f}%, improve rate = {ir:.3f}%")
        if plot_path:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            pts = np.asarray(points) * 1000.0
            fig, ax = plt.subplots(1, 2, figsize=(10, 4))
            for v in (-10.0, -2.25, 2.25, 10.0):
                ax[0].plot([v, v], [-10., 10.], c="black")
                ax[0].plot([-10., 10.], [v, v], c="black")
            if len(pts):
                ax[0].scatter(pts[:, 0], pts[:, 1])
            ax[0].set_title("misalignment distribution")
            ax[1].hist(angles, bins=20, edgecolor="black",
                       facecolor="blue", alpha=0.7)
            ax[1].set_title("angle distribution")
            os.makedirs(os.path.dirname(plot_path) or ".", exist_ok=True)
            fig.savefig(plot_path)
            plt.close(fig)
        return {"success_rate": success_cnt / num_games,
                "improve_rate": improve_cnt / n_steps,
                "steps_to_success_mean": sts_mean,
                "steps_to_success_median": sts_med,
                "steps_to_success": steps_to_success,
                "avg_reward": total_reward / num_games, **agg}

    def save(self, filename=None):
        os.makedirs(os.path.join(self.logdir, "models"), exist_ok=True)
        path = os.path.join(self.logdir, "models",
                            f"{filename or 'best_model'}.pkl")
        with open(path, "wb") as fp:
            pickle.dump({"params": jax.tree.map(np.asarray, self.params),
                         "obs_rms": jax.tree.map(np.asarray,
                                                 self.norm.obs_rms)}, fp)

    def load(self, path):
        with open(path, "rb") as fp:
            blob = pickle.load(fp)
        self.params = jax.tree.map(jnp.asarray, blob["params"])
        if blob.get("obs_rms") is not None:
            self.norm = self.norm.replace(
                obs_rms=jax.tree.map(jnp.asarray, blob["obs_rms"]))
