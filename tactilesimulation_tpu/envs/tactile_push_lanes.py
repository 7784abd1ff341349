"""Lane-major (batch-last) batched TactilePush — the TPU hot rollout path.

``vmap`` of the per-example env keeps coordinate components in the minor axis
((B, 3) / (B, 7) intermediates -> 3-7 of 128 VPU lanes used). This module
runs the SAME TactilePush semantics (reference envs/tactile_push_env.py —
see envs/tactile_push.py for the per-line parity notes) with the batch in the
last axis via ``sim.lanes``: q is (n, B), points are (3, N, B), and every
elementwise op runs at full lane utilization.

Used by ``bench.py`` and the GD trainer's batched BPTT rollouts. The DEFAULT
solver is the amortized chord (refresh=0: one Jacobian factor per env step,
budget +2, exact at-solution IFT adjoint — study-backed in
artifacts/SOLVER_ACCURACY_r04.jsonl); constructing with
``solver_refresh=1, solver_bwd='exact'`` reproduces
``vmap(TactilePushEnv.step)`` to float32 round-off, pinned by
tests/test_lanes.py::test_lane_env_parity_refresh1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct as fstruct

from ..sim import lanes
from .tactile_push import TACTILE_COLS, TACTILE_ROWS, TactilePushEnv


@fstruct.dataclass
class LanePushState:
    sim: lanes.LaneSimState        # (n, B) leaves
    keys: jax.Array                # (B, 2) per-episode PRNG keys
    t: jax.Array                   # (B,) int32
    goal: jax.Array                # (3, B)
    external_force: jax.Array      # (2, B)
    tactile: jax.Array             # (M*3, B) last captured field (or zeros)


class TactilePushLanes:
    """Batched TactilePush with lane-major physics.

    API (batch axis FIRST at the boundary, lane-major inside):
        reset(keys (B, 2))        -> (LanePushState, obs (B, ...))
        step(state, u (B, 3))     -> (state', obs, reward (B,), done, info)
    """

    def __init__(self, env: TactilePushEnv, *, solver_refresh: int = 0,
                 solver_bwd: str = "exact", max_iter: int = 0):
        self.env = env
        self.struct = env.struct
        self.model = env.model
        self.observation_type = env.observation_type
        self._needs_tactile = env._needs_tactile
        self._step_sim = lanes.build_step(env.struct)
        self.frame_skip = env.frame_skip
        self.substep_unroll = env.substep_unroll
        self.ndof_u = env.ndof_u
        self.max_episode_steps = env.max_episode_steps
        self.rebuild_solver(refresh=solver_refresh, bwd_mode=solver_bwd,
                            max_iter=max_iter)

    def rebuild_solver(self, *, refresh: int = 0, bwd_mode: str = "exact",
                       max_iter: int = 0, fused="auto", mega="auto"):
        """(Re)build the fused frame_skip sim step.

        Defaults from the round-4 accuracy study
        (artifacts/SOLVER_ACCURACY_r04.jsonl, TactilePush H=10 f32 vs a
        converged refresh=1/exact/iter=30 reference): chord LU amortized
        across the env step (refresh=0), budget +2, and the EXACT
        at-solution IFT adjoint (grad cos 0.955 == the per-substep
        baseline's 0.954 at refresh5/iter8/fused). 'fwdfac' (same matrix
        factored in the forward pass instead) measured SLOWER end-to-end
        (174 vs 194 rollouts/s) and is an A/B flag. The truly cheap adjoints are NOT shipped:
        'stale' (reuse the pre-solve forward LU) measured cos 0.39 and
        'refine' (LU-preconditioned iterative refinement) cos 0.37 — when
        contact activates mid-env-step the pre-solve factor lacks the
        contact stiffness entirely, so it is not even a convergent
        preconditioner for J^T at the solution; both kept for A/B only.
        ``refresh=1, bwd_mode='exact'`` reproduces scan-of-build_step
        exactly (parity tests). ``fused`` routes the contact chain through
        the Pallas pair-wrench kernel (auto: on TPU only)."""
        import jax as _jax
        self.solver_refresh = refresh
        self.solver_bwd = bwd_mode
        if max_iter == 0 and refresh == 0:
            # amortized chord: two extra (cheap) iterations recover the
            # per-substep-Jacobian baseline's gradient quality — r04 study:
            # refresh5/exact/iter8/fused cos 0.955 == baseline 0.954, and
            # iter8 costs far less than the 4 linearizes it replaces
            max_iter = max(self.struct.solver_max_iter + 2, 8)
        if fused == "auto":
            fused = _jax.default_backend() == "tpu"
        self._pw = None
        if fused:
            from ..ops import lane_contact
            pw, meta = lane_contact.make_pair_wrenches(self.struct)
            if pw is not None:
                self._pw = (pw, meta)
        # whole-env-step fused Pallas program (ops/megastep.py): same
        # refresh=0/'exact' semantics with the full substep + adjoint chain
        # VMEM-resident — the r05 headline path. Falls back to the lanes
        # stepper for any other solver config.
        from ..ops import megastep as _mega
        self.solver_mega = False
        if mega == "auto":
            mega = (_jax.default_backend() == "tpu" and refresh == 0
                    and bwd_mode == "exact"
                    and _mega.supported(self.struct, self.model))
        if mega:
            self._multi_step = _mega.build_env_step_mega(
                self.struct, self.model, self.frame_skip, max_iter=max_iter)
            self.solver_mega = True
        else:
            self._multi_step = lanes.build_env_step(
                self.struct, self.frame_skip, refresh=refresh,
                bwd_mode=bwd_mode, max_iter=max_iter, fused_pw=self._pw)

    # -- reset: per-episode randomization is once-per-rollout, so vmap of the
    # single-instance reset is fine; convert to lane layout after.
    def reset(self, keys) -> Tuple[LanePushState, jax.Array]:
        states, obs = jax.vmap(self.env.reset)(keys)
        ex = states.extras
        lane = LanePushState(
            sim=lanes.to_lanes(states.sim),
            keys=states.key, t=states.t,
            goal=ex.goal.T, external_force=ex.external_force.T,
            tactile=ex.tactile.T)
        return lane, obs

    def _get_obs(self, q, tactile, goal):
        """Lane-major observation; returns batch-first (B, ...) for policies."""
        grip_rot = q[0]                          # (B,)
        grip_pos = q[1:3]                        # (2, B)
        obj_pos = q[3:5]
        obj_rot = q[6]
        c, s = jnp.cos(-grip_rot), jnp.sin(-grip_rot)
        obj_local = jnp.stack([c * obj_pos[0] - s * obj_pos[1],
                               s * obj_pos[0] + c * obj_pos[1]]) - grip_pos
        obj_rot_local = obj_rot - grip_rot
        goal_local = jnp.stack([c * goal[0] - s * goal[1],
                                s * goal[0] + c * goal[1]]) - grip_pos
        goal_rot_local = goal[2] - grip_rot
        state3 = jnp.concatenate([goal_local, goal_rot_local[None]])  # (3, B)
        if self.observation_type == "privilege":
            return jnp.concatenate(
                [obj_local, obj_rot_local[None], state3]).T
        if self.observation_type == "no_tactile":
            return state3.T
        if self.observation_type == "tactile_flatten":
            return jnp.concatenate([state3, tactile]).T
        B = q.shape[1]
        img = tactile.reshape(TACTILE_ROWS, TACTILE_COLS, 3, B)
        return img.transpose(3, 2, 0, 1), state3.T

    def step(self, state: LanePushState, u):
        """u: (B, ndof_u) batch-first (policy output layout)."""
        model = self.model
        dtype = state.sim.q.dtype
        B = state.sim.q.shape[1]
        ul = jnp.asarray(u, dtype).T               # (3, B)
        action = jnp.tanh(ul)

        # disturbance force: resample every 10 steps, keep otherwise
        # (reference tactile_push_env.py:185-193) — per-lane PRNG streams
        # identical to vmap of the single-instance env.
        k3 = jax.vmap(lambda k: jax.random.split(k, 3))(state.keys)
        kf1, kf2, knext = k3[:, 0], k3[:, 1], k3[:, 2]
        resample = (state.t % 10) == 0                       # (B,)
        keep_zero = jax.vmap(jax.random.uniform)(kf1) >= 0.5
        sampled = jax.vmap(
            lambda k: jax.random.uniform(k, (2,), minval=-1.0, maxval=1.0,
                                         dtype=dtype))(kf2).T   # (2, B)
        new_force = jnp.where(keep_zero[None], jnp.zeros((2, B), dtype),
                              sampled)
        force = jnp.where(resample[None], new_force, state.external_force)

        robot_action = jnp.concatenate(
            [action, force, jnp.zeros((1, B), dtype)], axis=0)  # (6, B)

        sim_state = self._multi_step(model, state.sim, robot_action)
        q = sim_state.q
        if self._needs_tactile:
            if self._pw is not None:
                tac = lanes.tactile_field_fused(self.struct, model, q,
                                                sim_state.qdot, *self._pw)
            else:
                tac = lanes.tactile_field(self.struct, model, q,
                                          sim_state.qdot)
            tactile = tac.reshape(-1, B)                     # (M*3, B)
        else:
            tactile = state.tactile
        var = lanes.ee_positions(self.struct, model, q)      # (nvar, B)

        obs = self._get_obs(q, tactile, state.goal)

        obj_pos, obj_rot = q[3:5], q[6]
        goal = state.goal
        reward_pos = -jnp.sum(((obj_pos - goal[0:2]) / 0.01) ** 2,
                              axis=0) * 0.01
        reward_rot = -(((obj_rot - goal[2]) / (jnp.pi / 36.0)) ** 2) * 0.1
        reward_touch = -jnp.sum((var[0:3] - var[3:6]) ** 2, axis=0) / (0.02 ** 2)
        reward_action = -jnp.sum(ul ** 2, axis=0) * 0.1
        reward = reward_pos + reward_rot + reward_touch + reward_action

        info = {
            "reward_pos": reward_pos,
            "reward_rot": reward_rot,
            "reward_touch": reward_touch,
            "reward_action": reward_action,
            "final_pos_error": jnp.sqrt(
                jnp.sum((obj_pos - goal[0:2]) ** 2, axis=0)),
            "final_rot_error": jnp.abs(obj_rot - goal[2]),
        }
        new_state = LanePushState(
            sim=sim_state, keys=knext, t=state.t + 1, goal=goal,
            external_force=force, tactile=tactile)
        done = jnp.zeros((B,), bool)
        return new_state, obs, reward, done, info

    def batched_rollout_fn(self, policy_apply, horizon: int,
                           remat: bool = False, with_obs: bool = False):
        """(params, keys (E, 2)) -> (rewards (E, H), dones, infos
        [, obs (E, H, obs_dim)]): a whole epoch of episodes as ONE lane-major
        batched BPTT rollout — the GD trainer / bench.py workload. Same
        contract as FunctionalEnv.batched_rollout_fn (batch-first at the
        boundary; lane-major inside)."""

        def body(carry, _):
            state, obs, params = carry
            action = policy_apply(params, obs)
            state, obs2, reward, done, info = self.step(state, action)
            out = (reward, done, info) + ((obs,) if with_obs else ())
            return (state, obs2, params), out

        fbody = jax.checkpoint(body) if remat else body

        def run(params, keys):
            state, obs = self.reset(keys)
            _, outs = jax.lax.scan(fbody, (state, obs, params), None,
                                   length=horizon)
            # scan stacks time first: (H, B, ...) -> batch-first (B, H, ...)
            return jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), outs)

        return run


def make(observation_type: str = "tactile_flatten", **kw) -> TactilePushLanes:
    from . import tactile_push
    return TactilePushLanes(tactile_push.make(observation_type, **kw))
