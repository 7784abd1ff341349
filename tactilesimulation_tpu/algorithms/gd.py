"""GD: analytic-gradient (BPTT) policy optimization — the flagship
differentiability path (reference algorithms/gd.py, P10).

TPU-native restructuring: the reference runs 16 sequential episodes per epoch,
each stepping one C++ sim and calling loss.backward() through the FFI adjoint
(gd.py:220-264). Here one epoch is ONE jitted program:

    vmap over num_episodes parallel rollouts (scan over the horizon,
    rematerialized steps) -> mean episode reward -> jax.grad -> clip -> adam

so the 16-episode loop becomes a single batched differentiable rollout on the
accelerator, and scales further with `parallel/` sharding (psum of gradients
across chips).

Feature parity: linear-to-1e-5 lr schedule (gd.py:146-147), Adam betas, grad
norm clipping (:157-164), obs running-mean-std option (:69-71, 226-246),
best/interval/final checkpointing (:141-194), TensorBoard + console logging
(:171-211), deterministic evaluation (:266-299), FD gradient checkers
(test_gradient / test_simple_gradient, :332-468).
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

from ..models import nets
from ..utils import logging as log
from ..utils import profiling
from ..utils.running_mean_std import RunningMeanStd


class GD:
    def __init__(self, env, cfg: Dict[str, Any], logdir: Optional[str] = None,
                 seed: int = 0):
        """env: a FunctionalEnv; cfg: the reference YAML ``params`` dict."""
        self.env = env
        self.cfg = cfg
        config = cfg.get("config", {})
        network = cfg.get("network", {})
        self.seed = seed
        self.num_epochs = config.get("num_epochs", 300)
        self.num_episodes = config.get("num_episodes", 16)
        self.horizon = getattr(env, "max_episode_steps", 100)
        self.lr = config.get("lr", 3e-4)
        self.lr_schedule = config.get("lr_schedule", "linear")
        self.truncate_grads = config.get("truncate_grads", False)
        self.grad_norm = config.get("grad_norm", 1.0)
        self.betas = tuple(config.get("betas", (0.9, 0.999)))
        self.use_obs_rms = config.get("obs_rms", False)
        # Rematerialize rollout steps in the backward pass (default ON for
        # training: without it BPTT stores every substep's intermediates for
        # the whole horizon x batch — OOM risk at large E/H scales. bench.py
        # measures the speed tradeoff explicitly via --remat).
        self.remat = config.get("remat", True)
        self.logdir = logdir
        # §5.1 upgrade over the reference: device-trace profiling. Set cfg
        # config.profile_epochs = [lo, hi) to capture a JAX profiler trace of
        # those epochs into <logdir>/profile (TensorBoard PROFILE tab).
        self.profile_epochs = tuple(config.get("profile_epochs", ()))
        self.timer = profiling.PhaseTimer()

        # Route batched BPTT rollouts through the lane-major (batch-last)
        # core when the env provides one — same physics, ~full VPU lane
        # utilization (sim/lanes.py). Falls back to vmap of the per-episode
        # env otherwise. Opt out with cfg config.lane_rollouts: false.
        lane = (env.lane_env() if config.get("lane_rollouts", True)
                and hasattr(env, "lane_env") else None)
        self.rollout_env = lane if lane is not None else env

        # Data-parallel episode sharding over every visible device (all
        # chips of all hosts when parallel.distributed.initialize() formed a
        # cluster) — the replacement for the reference's SubprocVecEnv pool.
        # Auto-enabled when the episode batch divides the device count.
        ndev = len(jax.devices())
        self.mesh = None
        if (config.get("data_parallel", True) and ndev > 1
                and self.num_episodes % ndev == 0):
            from ..parallel import distributed
            self.mesh = distributed.global_mesh()

        actor_name = network.get("actor", "DiagGaussianActor")
        assert actor_name == "DiagGaussianActor", (
            "GD drives flat-obs actors; use observation_type with vector obs")
        self.actor = nets.DiagGaussianActor(env.ndof_u, network)
        obs_dim = env.obs_size()[0]
        key = jax.random.PRNGKey(seed)
        self.params = self.actor.init(key, jnp.zeros(obs_dim))
        self.obs_rms = (RunningMeanStd.create((obs_dim,), jnp.float64
                                              if jax.config.jax_enable_x64
                                              else jnp.float32)
                        if self.use_obs_rms else None)

        if self.lr_schedule == "linear":
            sched = optax.linear_schedule(self.lr, 1e-5, self.num_epochs)
        else:
            sched = self.lr
        chain = []
        if self.truncate_grads:
            chain.append(optax.clip_by_global_norm(self.grad_norm))
        chain.append(optax.adam(sched, b1=self.betas[0], b2=self.betas[1]))
        self.optimizer = optax.chain(*chain)
        self.opt_state = self.optimizer.init(self.params)

        # resumable training state (full-state checkpointing, §5.4)
        self._epoch = 0
        self._best = -np.inf
        self._train_key = jax.random.PRNGKey(self.seed)

        self._build()

    # ------------------------------------------------------------------
    def _build(self):
        env, actor = self.rollout_env, self.actor

        def policy_apply_factory(obs_rms):
            def apply(params, obs):
                if obs_rms is not None:
                    obs = obs_rms.normalize(obs)
                return actor.apply(params, obs, deterministic=True,
                                   method=actor.act)
            return apply

        def epoch_loss(params, keys, obs_rms):
            run = env.batched_rollout_fn(
                policy_apply_factory(obs_rms), self.horizon,
                remat=self.remat, with_obs=self.use_obs_rms)
            outs = run(params, keys)
            rewards, infos = outs[0], outs[2]
            episode_reward = jnp.sum(rewards, axis=-1)   # (E,)
            loss = -jnp.mean(episode_reward)
            obs_seen = (jax.lax.stop_gradient(outs[3])
                        if self.use_obs_rms else None)
            return loss, (episode_reward, infos, obs_seen)

        def update(params, opt_state, keys, obs_rms):
            (loss, aux), grads = jax.value_and_grad(
                epoch_loss, has_aux=True)(params, keys, obs_rms)
            gnorm = optax.global_norm(grads)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if self.use_obs_rms:
                # Post-epoch bulk stats update with the obs the policy saw
                # this epoch. NOTE: this is a *parallelized approximation* of
                # the reference (gd.py:226-246), which updates the stats
                # incrementally per sequential episode (episode i normalizes
                # with stats already including episodes 0..i-1 of the same
                # epoch, and its update includes the terminal observation).
                # Here all E episodes normalize with the pre-epoch stats and
                # one bulk update excludes each episode's final obs — the
                # numerics converge to the same statistics but diverge
                # epoch-by-epoch from the reference.
                obs_seen = aux[2]
                obs_rms = obs_rms.update(
                    obs_seen.reshape(-1, obs_seen.shape[-1]))
            return params, opt_state, loss, aux[:2], gnorm, obs_rms

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P
            try:
                from jax import shard_map
                _sm_kw = {"check_vma": False}
            except ImportError:
                # the experimental module (older JAX) spells the kwarg
                # check_rep, not check_vma
                from jax.experimental.shard_map import shard_map
                _sm_kw = {"check_rep": False}

            def update_spmd(params, opt_state, keys, obs_rms):
                """Explicit-SPMD epoch update: each device rolls out its
                episode shard, gradients/losses are pmean'd over the ICI
                mesh, and every output is replicated (all-gathered aux is a
                tiny (E,) float vector). shard_map instead of GSPMD
                auto-partitioning so the fused Pallas contact kernel
                (ops/lane_contact.py) partitions by construction — the SPMD
                partitioner has no rule for custom calls."""
                (loss, aux), grads = jax.value_and_grad(
                    epoch_loss, has_aux=True)(params, keys, obs_rms)
                loss = jax.lax.pmean(loss, "batch")
                grads = jax.lax.pmean(grads, "batch")
                gnorm = optax.global_norm(grads)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = optax.apply_updates(params, updates)
                if self.use_obs_rms:
                    obs_seen = jax.lax.all_gather(aux[2], "batch",
                                                  tiled=True)
                    obs_rms = obs_rms.update(
                        obs_seen.reshape(-1, obs_seen.shape[-1]))
                ep_r = jax.lax.all_gather(aux[0], "batch", tiled=True)
                infos = jax.tree.map(
                    lambda x: jax.lax.all_gather(x, "batch", tiled=True),
                    aux[1])
                return params, opt_state, loss, (ep_r, infos), gnorm, obs_rms

            self._update = jax.jit(shard_map(
                update_spmd, mesh=self.mesh,
                in_specs=(P(), P(), P("batch"), P()),
                out_specs=P(), **_sm_kw))
        else:
            self._update = jax.jit(update)
        self._policy_factory = policy_apply_factory

        def play_episode(params, key, obs_rms):
            run = self.env.rollout_fn(policy_apply_factory(obs_rms),
                                      self.horizon, remat=False)
            rewards, dones, infos = run(params, key)
            return jnp.sum(rewards), infos

        self._play = jax.jit(play_episode)

    # ------------------------------------------------------------------
    def train(self, stop_epoch: Optional[int] = None):
        """Run epochs [resumed-epoch, num_epochs); ``stop_epoch`` truncates
        early (checkpoint/resume tests simulate a crash with it)."""
        end_epoch = (self.num_epochs if stop_epoch is None
                     else min(stop_epoch, self.num_epochs))
        writer = log.SummaryWriter(os.path.join(self.logdir, "log")) \
            if self.logdir else None
        textlog = log.TextLog(os.path.join(self.logdir, "logs.txt")) \
            if self.logdir else None
        episode_rewards = deque(maxlen=200)
        key = self._train_key
        best = self._best
        t_start = time.time()
        total_steps = self._epoch * self.num_episodes * self.horizon

        if self.logdir and self._epoch == 0:
            self.save("init_policy")
        profile_ctx = None
        for epoch in range(self._epoch, end_epoch):
            if self.profile_epochs and self.logdir:
                if epoch == self.profile_epochs[0]:
                    profile_ctx = profiling.trace(
                        os.path.join(self.logdir, "profile"))
                    profile_ctx.__enter__()
                elif epoch == self.profile_epochs[1] and profile_ctx:
                    profile_ctx.__exit__(None, None, None)
                    profile_ctx = None
            key, *ekeys = jax.random.split(key, self.num_episodes + 1)
            ekeys = jnp.stack(ekeys)
            if self.mesh is not None:
                from ..parallel import distributed
                ekeys = distributed.global_from_full(self.mesh, ekeys)
            with self.timer.phase("update") as box:
                out = self._update(
                    self.params, self.opt_state, ekeys,
                    self.obs_rms)
                box["sync"] = out
            self.params, self.opt_state, loss, aux, gnorm, self.obs_rms = out
            ep_rewards = np.asarray(aux[0])
            episode_rewards.extend(ep_rewards.tolist())
            total_steps += self.num_episodes * self.horizon
            mean_r = float(np.mean(episode_rewards))
            fps = total_steps / (time.time() - t_start)

            msg = (f"epoch {epoch}: num steps = {total_steps}, "
                   f"FPS = {fps:.1f}, mean(reward) = {mean_r:.6f}, "
                   f"grad_norm = {float(gnorm):.3f}")
            if mean_r > best:
                log.print_ok(msg)
                best = mean_r
                if self.logdir:
                    self.save()
            else:
                print(msg)
            if textlog:
                textlog.append(msg)
            if writer:
                writer.add_scalar("rewards/step", mean_r, total_steps)
                writer.add_scalar("rewards/iter", mean_r, epoch)
                writer.add_scalar("loss/iter", float(loss), epoch)
                writer.add_scalar("grad_norm/iter", float(gnorm), epoch)
                self.timer.log_to(writer, epoch)
                writer.flush()
            # full-state checkpoint every epoch: params + optimizer state +
            # normalizer + epoch + PRNG key + best metric, so a killed run
            # resumes exactly (the reference loses Adam state and the epoch
            # counter on restart — SURVEY.md §5.4 gap, fixed here)
            self._train_key, self._best, self._epoch = key, best, epoch + 1
            if self.logdir:
                self.save_checkpoint()
            if self.logdir and epoch % 50 == 0:
                self.save(f"policy_iter{epoch}_reward{mean_r:.2f}")
        if profile_ctx:
            profile_ctx.__exit__(None, None, None)
        if self.logdir:
            self.save("final_policy")
        if writer:
            writer.close()
        return float(np.mean(episode_rewards))

    # ------------------------------------------------------------------
    def evaluate(self, num_games=1, key=None):
        key = jax.random.PRNGKey(self.seed + 1) if key is None else key
        total = 0.0
        for g in range(num_games):
            key, k = jax.random.split(key)
            reward, _ = self._play(self.params, k, self.obs_rms)
            total += float(reward)
        return total / num_games

    def save(self, filename=None):
        os.makedirs(os.path.join(self.logdir, "models"), exist_ok=True)
        path = os.path.join(self.logdir, "models",
                            f"{filename or 'best_model'}.pkl")
        with open(path, "wb") as fp:
            pickle.dump({"params": jax.tree.map(np.asarray, self.params),
                         "obs_rms": jax.tree.map(np.asarray, self.obs_rms)
                         if self.obs_rms else None}, fp)

    def load(self, path):
        with open(path, "rb") as fp:
            blob = pickle.load(fp)
        self.params = jax.tree.map(jnp.asarray, blob["params"])
        if blob.get("obs_rms") is not None:
            self.obs_rms = jax.tree.map(jnp.asarray, blob["obs_rms"])

    # -- full-state checkpoint / resume (upgrade over the reference, which
    # loses optimizer state and the epoch counter on restart — §5.4) --------
    def save_checkpoint(self, name: str = "checkpoint"):
        from ..utils import checkpoint
        checkpoint.save_state(
            os.path.join(self.logdir, name),
            {"params": self.params, "opt_state": self.opt_state,
             "obs_rms": self.obs_rms, "epoch": self._epoch,
             "best": self._best, "key": self._train_key})

    def resume(self, path):
        """Restore params/opt_state/obs_rms/epoch/PRNG key; a subsequent
        train() continues exactly where the checkpointed run stopped."""
        from ..utils import checkpoint
        # target pytree gives the restorer the container types (optax
        # NamedTuples, RunningMeanStd dataclass) to rebuild into
        target = {"params": self.params, "opt_state": self.opt_state,
                  "obs_rms": self.obs_rms, "epoch": 0, "best": 0.0,
                  "key": self._train_key}
        blob = checkpoint.restore_state(path, target)
        as_jnp = lambda t: jax.tree.map(jnp.asarray, t)
        self.params = as_jnp(blob["params"])
        self.opt_state = as_jnp(blob["opt_state"])
        if blob.get("obs_rms") is not None:
            self.obs_rms = as_jnp(blob["obs_rms"])
        self._epoch = int(blob["epoch"])
        self._best = float(blob["best"])
        self._train_key = jnp.asarray(blob["key"])

    # ------------------------------------------------------------------
    def test_gradient(self, num_params=20, key=None, eps_list=(1e-2, 1e-3, 1e-4)):
        """FD check of policy-parameter gradients through the full BPTT path
        (reference GD.test_gradient, gd.py:332-405). Returns per-eps
        (abs_err, rel_err, cosine)."""
        key = jax.random.PRNGKey(123) if key is None else key
        episode_key = jax.random.split(key, 2)[0]

        def total_reward(params):
            run = self.env.rollout_fn(
                self._policy_factory(self.obs_rms), min(self.horizon, 20),
                remat=False)
            rewards, _, _ = run(params, episode_key)
            return jnp.sum(rewards)

        g = jax.jit(jax.grad(total_reward))(self.params)
        flat_g, _ = jax.flatten_util.ravel_pytree(g)
        flat_p, unravel_p = jax.flatten_util.ravel_pytree(self.params)
        idx = np.random.RandomState(0).randint(0, flat_p.shape[0], num_params)
        f = jax.jit(lambda p: total_reward(unravel_p(p)))
        base = float(f(flat_p))
        results = []
        for eps in eps_list:
            fd = np.zeros(num_params)
            for n, i in enumerate(idx):
                pp = flat_p.at[i].add(eps)
                fd[n] = (float(f(pp)) - base) / eps
            an = np.asarray(flat_g[idx])
            abs_err = np.linalg.norm(fd - an)
            rel_err = abs_err / max(1e-7, min(np.linalg.norm(fd),
                                              np.linalg.norm(an)))
            cos = float(np.dot(fd, an)
                        / max(1e-12, np.linalg.norm(fd) * np.linalg.norm(an)))
            results.append((abs_err, rel_err, cos))
        return results
