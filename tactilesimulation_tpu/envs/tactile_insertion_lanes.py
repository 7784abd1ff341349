"""Lane-major (batch-last) batched TactileInsertion — the PPO-RNN hot path.

Why this exists: every TactileInsertion env step re-executes a 45-substep
scripted insertion (reference envs/tactile_insertion_env.py:330-359), and the
round-4 training run drove it through ``vmap`` of the single-instance core —
measured 324 ms per vec step at B = 8 on TPU v5e (points-minor layout uses
3-7 of 128 VPU lanes and the graph is op-dispatch-bound), with the auto-reset
``lax.cond`` paying the 45-substep reset script EVERY step on top. The 5e6
step reference protocol was infeasible (weeks of wall-clock).

This module runs the same semantics lane-major via ``sim.lanes``:

- the scripted execution is ONE batched chord-solver rollout over (12, B)
  coordinates with the fused Pallas contact kernel, with the chord LU
  refreshed on a static substep schedule;
- contact/tactile domain randomization is per-lane: the ``Model`` contact
  param leaves carry a trailing batch axis ((K, B)), threaded through
  ``contact.combined_params`` -> (K, 4, B) and the kernel's VMEM param path;
- auto-reset is FUSED with the step: the policy-adjusted start poses (step
  side) and freshly sampled reset poses (reset side) are concatenated into
  one 2B-lane ``_execute`` call, so the per-step cost is one batched script
  execution instead of vmapped step + reset branches;
- everything per-step that is NOT the hot script (action -> q_cmd clipping,
  reset sampling, outcome/reward, the tactile-frame observation pipeline) is
  the single-instance env's own methods under ``vmap`` — zero semantic
  divergence by construction.

PPO needs no simulation gradients, so this path is forward-only (the lane
chord solver runs without the IFT custom VJP).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct as fstruct

from ..sim import contact, lanes
from .tactile_insertion import EXEC_STEPS, TactileInsertionEnv


@fstruct.dataclass
class LaneInsertionState:
    """Per-lane episode state (batch-LAST on the q-like leaves)."""
    current_q_init: jax.Array      # (12, B)
    original_q_init: jax.Array     # (12, B)
    prev_object_pose: jax.Array    # (3, B)
    pair_kn: jax.Array             # (K, B) per-lane DR overrides
    pair_kt: jax.Array
    pair_mu: jax.Array
    pair_damping: jax.Array
    tac_kn: jax.Array              # (S, B)
    tac_kt: jax.Array
    tac_mu: jax.Array
    tac_damping: jax.Array
    grasp_force: jax.Array         # (B,)
    key: jax.Array                 # (B, 2) per-lane PRNG


class TactileInsertionLanes:
    """Batched TactileInsertion with lane-major physics.

    API (batch axis FIRST at the boundary):
        vec_reset(keys (B, 2))                        -> (state, obs (B, .))
        vec_step_autoreset(state, obs, t, action, rkeys)
            -> (state', obs', t', reward, done, bad, success)
    matching the contract of PPO/PPORNN's vmapped ``env_step_autoreset``.
    """

    def __init__(self, env: TactileInsertionEnv, *, refresh: int = 5,
                 max_iter: int = 0, fused="auto"):
        assert env.struct.integrator.upper() == "BDF1"
        self.env = env
        self.struct = env.struct
        self.model = env.model
        self.max_episode_steps = env.max_episode_steps
        self.refresh = refresh
        self.max_iter = max_iter or env.struct.solver_max_iter
        if fused == "auto":
            fused = jax.default_backend() == "tpu"
        self._pw = None
        if fused:
            from ..ops import lane_contact
            pw, meta = lane_contact.make_pair_wrenches(self.struct)
            if pw is not None:
                self._pw = (pw, meta)
        self._residual = lanes.make_residual(self.struct, self._pw)

    # delegate the policy-facing surface
    @property
    def ndof_u(self):
        return self.env.ndof_u

    def obs_size(self):
        return self.env.obs_size()

    # ------------------------------------------------------------------
    def _batched_model(self, st: LaneInsertionState):
        """Model with per-lane contact-param leaves ((K, B) / (S, B))."""
        return self.model.replace(
            pair_kn=st.pair_kn, pair_kt=st.pair_kt, pair_mu=st.pair_mu,
            pair_damping=st.pair_damping, tac_kn=st.tac_kn, tac_kt=st.tac_kt,
            tac_mu=st.tac_mu, tac_damping=st.tac_damping)

    def _tactile(self, model, q, v):
        if self._pw is not None:
            return lanes.tactile_field_fused(self.struct, model, q, v,
                                             *self._pw)
        return lanes.tactile_field(self.struct, model, q, v)

    def _lane_execute(self, model, q_cmd, grasp_force, kobs):
        """Batched 45-substep scripted insertion (mirrors
        TactileInsertionEnv._execute, reference :330-359, lane-major).

        q_cmd (12, B), grasp_force (B,), kobs (B, 2) per-lane obs-noise keys.
        Returns (final_q (12, B), obs (B, ...) batch-first).
        """
        env = self.env
        dtype = q_cmd.dtype
        B = q_cmd.shape[1]
        h = model.h
        tol = max(self.struct.solver_tol,
                  1e-7 if dtype == jnp.float32 else 1e-12)

        init_jp = q_cmd[:6]                                   # (6, B)
        target = init_jp.at[2].add(-0.0011)
        frac = (jnp.arange(1, EXEC_STEPS + 1, dtype=dtype)
                / EXEC_STEPS)[:, None, None]
        us = init_jp[None] + frac * (target - init_jp)[None]  # (45, 6, B)
        us = us.at[:, 2].add(0.003)
        us = us.at[:, 4].set(grasp_force[None])
        us = us.at[:, 5].set(grasp_force[None])

        state = lanes.LaneSimState(
            q=q_cmd, qdot=jnp.zeros_like(q_cmd), q_prev=q_cmd,
            qdot_prev=jnp.zeros_like(q_cmd),
            t=jnp.zeros((B,), jnp.int32))

        def inputs_at(state, u):
            p_now = lanes.momentum(self.struct, model, state.q, state.qdot)
            return lanes.StepInputs(model=model, u=u, q_base=state.q,
                                    p_base=p_now,
                                    gamma=jnp.full((1, 1), h, dtype))

        # ONE scan over the 45 script substeps: the chord LU is refreshed
        # in-scan every `refresh` substeps (scalar-predicate cond = a real
        # runtime branch), and the tactile field is mask-accumulated into
        # the static capture slots — the whole script compiles to a single
        # substep + J-build + tactile-query graph instead of 45 copies.
        frames = np.asarray([int(f) for f in env.capture_frames])
        nframes = len(frames)
        M = len(self.struct.tac_joint)
        frames_j = jnp.asarray(frames)

        lu0 = lanes.make_chord_lu(self._residual, inputs_at(state, us[0]),
                                  state.qdot,
                                  reverse=self._pw is not None)
        caps0 = jnp.zeros((nframes, M, 3, B), dtype)

        def body(carry, xs):
            state, lu, caps = carry
            i, u = xs
            inputs = inputs_at(state, u)
            lu = jax.lax.cond(
                (i % self.refresh) == 0,
                lambda: lanes.make_chord_lu(self._residual, inputs,
                                            state.qdot,
                                            reverse=self._pw is not None),
                lambda: lu)
            v = lanes._chord(self._residual, self.max_iter, tol, inputs,
                             state.qdot, lu)
            state = lanes.LaneSimState(q=state.q + h * v, qdot=v,
                                       q_prev=state.q,
                                       qdot_prev=state.qdot,
                                       t=state.t + 1)
            tac = self._tactile(model, state.q, state.qdot)  # (M, 3, B)
            sel = (frames_j == i).astype(dtype)              # (nframes,)
            caps = caps + sel[:, None, None, None] * tac[None]
            return (state, lu, caps), None

        (state, _, cap), _ = jax.lax.scan(
            body, (state, lu0, caps0),
            (jnp.arange(EXEC_STEPS), us))                  # (S+1, M, 3, B)
        cap_b = jnp.moveaxis(cap, -1, 0)                   # (B, S+1, M, 3)
        obs = jax.vmap(env._obs_from_captured)(cap_b, kobs)
        return state.q, obs

    # ------------------------------------------------------------------
    def vec_reset(self, keys) -> Tuple[LaneInsertionState, jax.Array]:
        env = self.env
        s = jax.vmap(env._sample_reset)(keys)              # (B, ...) leaves
        st = LaneInsertionState(
            current_q_init=s["q_cmd"].T, original_q_init=s["q_cmd"].T,
            prev_object_pose=jnp.stack([s["q_cmd"][:, 0], s["q_cmd"][:, 1],
                                        s["q_cmd"][:, 3]]),
            pair_kn=s["pair_kn"].T, pair_kt=s["pair_kt"].T,
            pair_mu=s["pair_mu"].T, pair_damping=s["pair_damping"].T,
            tac_kn=s["tac_kn"].T, tac_kt=s["tac_kt"].T, tac_mu=s["tac_mu"].T,
            tac_damping=s["tac_damping"].T, grasp_force=s["grasp_force"],
            key=s["knext"])
        model = self._batched_model(st)
        _, obs = self._lane_execute(model, st.current_q_init,
                                    st.grasp_force, s["kobs"])
        return st, obs

    def vec_step_autoreset(self, st: LaneInsertionState, obs, t, action,
                           rkeys):
        """One fused vec step: policy step for every lane + fresh reset for
        every lane, both scripts executed in ONE 2B-lane `_execute`; lanes
        whose episode ended (success or truncation at max_episode_steps)
        continue from the reset side. Returns
        (state', obs', t', reward, done, bad, success) — the contract of
        PPO's vmapped ``env_step_autoreset``."""
        env = self.env
        B = st.current_q_init.shape[1]

        # per-lane keys: obs noise for the step side + carry
        ks = jax.vmap(lambda k: jax.random.split(k, 2))(st.key)
        kobs_step, knext = ks[:, 0], ks[:, 1]

        # step side: action -> commanded pose (single-instance logic, vmapped)
        q_cmd_step = jax.vmap(env._apply_action)(
            st.current_q_init.T, st.original_q_init.T, action).T   # (12, B)

        # reset side: fresh sampling (single-instance logic, vmapped)
        r = jax.vmap(env._sample_reset)(rkeys)
        q_cmd_reset = r["q_cmd"].T

        # one 2B-lane scripted execution
        q_cmd_all = jnp.concatenate([q_cmd_step, q_cmd_reset], axis=1)
        grasp_all = jnp.concatenate([st.grasp_force, r["grasp_force"]])
        kobs_all = jnp.concatenate([kobs_step, r["kobs"]], axis=0)
        dr_all = {
            k: jnp.concatenate([getattr(st, k), r[k].T], axis=1)
            for k in ("pair_kn", "pair_kt", "pair_mu", "pair_damping",
                      "tac_kn", "tac_kt", "tac_mu", "tac_damping")}
        model_all = self.model.replace(**dr_all)
        final_q_all, obs_all = self._lane_execute(model_all, q_cmd_all,
                                                  grasp_all, kobs_all)
        final_q_step = final_q_all[:, :B]
        obs_step, obs_reset = obs_all[:B], obs_all[B:]

        # outcome (single-instance logic, vmapped)
        success, reward, pose, improve = jax.vmap(env._outcome)(
            final_q_step.T, q_cmd_step.T, st.prev_object_pose.T)

        t = t + 1
        truncated = t >= self.max_episode_steps
        reset_now = success | truncated
        bad = truncated & ~success
        t = jnp.where(reset_now, 0, t)

        def where_last(cond, a, b):
            """jnp.where with cond broadcast over the LAST axis."""
            shape = [1] * (a.ndim - 1) + [cond.shape[0]]
            return jnp.where(cond.reshape(shape), a, b)

        stepped = LaneInsertionState(
            current_q_init=q_cmd_step, original_q_init=st.original_q_init,
            prev_object_pose=jnp.stack([q_cmd_step[0], q_cmd_step[1],
                                        q_cmd_step[3]]),
            pair_kn=st.pair_kn, pair_kt=st.pair_kt, pair_mu=st.pair_mu,
            pair_damping=st.pair_damping, tac_kn=st.tac_kn,
            tac_kt=st.tac_kt, tac_mu=st.tac_mu, tac_damping=st.tac_damping,
            grasp_force=st.grasp_force, key=knext)
        resetted = LaneInsertionState(
            current_q_init=q_cmd_reset, original_q_init=q_cmd_reset,
            prev_object_pose=jnp.stack([q_cmd_reset[0], q_cmd_reset[1],
                                        q_cmd_reset[3]]),
            pair_kn=r["pair_kn"].T, pair_kt=r["pair_kt"].T,
            pair_mu=r["pair_mu"].T, pair_damping=r["pair_damping"].T,
            tac_kn=r["tac_kn"].T, tac_kt=r["tac_kt"].T, tac_mu=r["tac_mu"].T,
            tac_damping=r["tac_damping"].T, grasp_force=r["grasp_force"],
            key=r["knext"])
        new_state = jax.tree.map(
            lambda a, b: (where_last(reset_now, a, b) if a.ndim > 1
                          or a.shape == reset_now.shape
                          else jnp.where(reset_now, a, b)),
            resetted, stepped)
        # obs / keys are batch-FIRST
        new_state = new_state.replace(
            key=jnp.where(reset_now[:, None], resetted.key, stepped.key))
        shape = (B,) + (1,) * (obs_step.ndim - 1)
        new_obs = jnp.where(reset_now.reshape(shape), obs_reset, obs_step)
        return new_state, new_obs, t, reward, reset_now, bad, success


def make(observation_type: str = "tactile_map", **kw) -> TactileInsertionLanes:
    from . import tactile_insertion
    lane_kw = {k: kw.pop(k) for k in ("refresh", "max_iter", "fused")
               if k in kw}
    return TactileInsertionLanes(
        tactile_insertion.make(observation_type, **kw), **lane_kw)
