"""TactilePush: differentiable pushing with a 13x10 tactile pad.

Functional re-implementation of the reference task (envs/tactile_push_env.py):
a rotating/planar gripper with a cylindrical tactile pad pushes a box to a
random goal pose under random external disturbance forces, with a smooth
differentiable reward — the flagship analytic-gradient (BPTT) task.

Parity notes (reference file:line):
- obs types tactile_flatten / tactile_map / privilege / no_tactile (:34-48)
- reset randomization: q[1] = -0.001, box y ~ U(-0.02, 0.02) (:133-136),
  goal xy ~ U([0.15,-0.2],[0.25,0.2]), goal rot ~ U(y*pi ± pi/16) (:143-146)
- external disturbance resampled every 10 steps w.p. 0.5 (:185-193)
- tanh action squash (:177), frame_skip 5 (:66)
- reward = pos + rot + touch + action terms (:206-211)
- tactile force normalizers 3e-6 shear / 3e-3 normal (:285-286)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct as fstruct

from ..model import builder, xml_parser
from ..sim import dynamics, integrators, kinematics
from .base import EnvState, FunctionalEnv

TACTILE_ROWS, TACTILE_COLS = 13, 10


@fstruct.dataclass
class PushExtras:
    goal: jax.Array            # (3,) x, y, rot
    external_force: jax.Array  # (2,)
    tactile: jax.Array         # (rows*cols*3,) last captured field


class TactilePushEnv(FunctionalEnv):
    max_episode_steps = 100
    frame_skip = 5
    action_dim = 3
    #: unroll factor of the frame_skip substep loop (1 = lax.scan rolled;
    #: frame_skip = fully unrolled — bigger XLA graph, lower per-substep
    #: dispatch overhead on TPU)
    substep_unroll = 1

    def __init__(self, struct_, model, observation_type: str = "tactile_flatten"):
        super().__init__(struct_, model)
        assert observation_type in (
            "tactile_flatten", "tactile_map", "privilege", "no_tactile")
        self.observation_type = observation_type
        self._step_sim = integrators.build_step(struct_)
        # privilege/no_tactile never read the tactile field (obs and reward
        # are tactile-free), so skip the marker-force evaluation entirely —
        # the markers still act on the dynamics through contact_terms inside
        # the step; only the separate field *query* is elided.
        self._needs_tactile = observation_type in ("tactile_flatten",
                                                   "tactile_map")

    # -- observation -------------------------------------------------------
    def obs_size(self) -> Tuple[int, ...]:
        if self.observation_type == "tactile_flatten":
            return (3 + TACTILE_ROWS * TACTILE_COLS * 3,)
        if self.observation_type == "tactile_map":
            return (3, TACTILE_ROWS, TACTILE_COLS)  # plus (3,) state vector
        if self.observation_type == "privilege":
            return (6,)
        return (3,)

    def _get_obs(self, q, tactile, goal):
        # gripper-local frame transform (reference :84-101)
        grip_rot = q[0]
        grip_pos = q[1:3]
        obj_pos = q[3:5]
        obj_rot = q[6]
        c, s = jnp.cos(-grip_rot), jnp.sin(-grip_rot)
        rot = jnp.array([[c, -s], [s, c]])
        obj_local = rot @ obj_pos - grip_pos
        obj_rot_local = obj_rot - grip_rot
        goal_local = rot @ goal[0:2] - grip_pos
        goal_rot_local = goal[2] - grip_rot
        state3 = jnp.concatenate([goal_local, goal_rot_local[None]])
        if self.observation_type == "privilege":
            return jnp.concatenate(
                [obj_local, obj_rot_local[None], goal_local,
                 goal_rot_local[None]])
        if self.observation_type == "no_tactile":
            return state3
        if self.observation_type == "tactile_flatten":
            return jnp.concatenate([state3, tactile])
        # tactile_map: (3, rows, cols) image + (3,) state tuple
        img = tactile.reshape(TACTILE_ROWS, TACTILE_COLS, 3).transpose(2, 0, 1)
        return (img, state3)

    # -- api ---------------------------------------------------------------
    def reset(self, key):
        kq, kg1, kg2, knext = jax.random.split(key, 4)
        dtype = self.model.q_init.dtype
        q = self.model.q_init
        q = q.at[1].set(-0.001)
        q = q.at[4].set(jax.random.uniform(kq, minval=-0.02, maxval=0.02,
                                           dtype=dtype))
        goal_xy = jax.random.uniform(
            kg1, (2,), minval=jnp.array([0.15, -0.2]),
            maxval=jnp.array([0.25, 0.2]), dtype=dtype)
        goal_rot = goal_xy[1] * jnp.pi + jax.random.uniform(
            kg2, minval=-jnp.pi / 16, maxval=jnp.pi / 16, dtype=dtype)
        goal = jnp.concatenate([goal_xy, goal_rot[None]])

        sim_state = integrators.initial_state(self.struct, self.model).replace(
            q=q, q_prev=q)
        if self._needs_tactile:
            tactile = dynamics.tactile_field(
                self.struct, self.model, q, jnp.zeros_like(q)).reshape(-1)
        else:
            tactile = jnp.zeros(TACTILE_ROWS * TACTILE_COLS * 3, dtype)
        state = EnvState(
            sim=sim_state, key=knext, t=jnp.zeros((), jnp.int32),
            extras=PushExtras(goal=goal,
                              external_force=jnp.zeros(2, dtype),
                              tactile=tactile))
        return state, self._get_obs(q, tactile, goal)

    def step(self, state: EnvState, u):
        ex = state.extras
        dtype = state.sim.q.dtype
        action = jnp.tanh(u)

        # disturbance force: resample every 10 steps, keep otherwise (:185-193)
        kf1, kf2, knext = jax.random.split(state.key, 3)
        resample = (state.t % 10) == 0
        keep_zero = jax.random.uniform(kf1) >= 0.5
        new_force = jnp.where(
            keep_zero, jnp.zeros(2, dtype),
            jax.random.uniform(kf2, (2,), minval=-1.0, maxval=1.0, dtype=dtype))
        force = jnp.where(resample, new_force, ex.external_force)

        robot_action = jnp.zeros(6, dtype)
        robot_action = robot_action.at[0:3].set(action)
        robot_action = robot_action.at[3:5].set(force)

        sim_state, _ = jax.lax.scan(
            lambda s, _: (self._step_sim(self.model, s, robot_action), None),
            state.sim, None, length=self.frame_skip,
            unroll=self.substep_unroll)
        q = sim_state.q
        if self._needs_tactile:
            tactile = dynamics.tactile_field(
                self.struct, self.model, q, sim_state.qdot).reshape(-1)
        else:
            tactile = ex.tactile  # zeros carried through (never read)
        var = kinematics.ee_positions(self.struct, self.model, q)

        obs = self._get_obs(q, tactile, ex.goal)

        # differentiable reward (:206-211)
        obj_pos, obj_rot = q[3:5], q[6]
        reward_pos = -jnp.sum(((obj_pos - ex.goal[0:2]) / 0.01) ** 2) * 0.01
        reward_rot = -(((obj_rot - ex.goal[2]) / (jnp.pi / 36.0)) ** 2) * 0.1
        reward_touch = -jnp.sum((var[0:3] - var[3:6]) ** 2) / (0.02 ** 2)
        reward_action = -jnp.sum(u ** 2) * 0.1
        reward = reward_pos + reward_rot + reward_touch + reward_action

        info = {
            "reward_pos": reward_pos,
            "reward_rot": reward_rot,
            "reward_touch": reward_touch,
            "reward_action": reward_action,
            "final_pos_error": jnp.linalg.norm(obj_pos - ex.goal[0:2]),
            "final_rot_error": jnp.abs(obj_rot - ex.goal[2]),
        }
        new_state = EnvState(
            sim=sim_state, key=knext, t=state.t + 1,
            extras=PushExtras(goal=ex.goal, external_force=force,
                              tactile=tactile))
        return new_state, obs, reward, jnp.zeros((), bool), info

    def lane_env(self):
        """Lane-major twin (sim.lanes core) — the TPU batched hot path."""
        from .tactile_push_lanes import TactilePushLanes
        return TactilePushLanes(self)

    def tactile_forces_array(self, tactile_flat):
        """(1, 1, rows, cols, 3) with the reference normalizers (:283-287)."""
        arr = tactile_flat.reshape(1, 1, TACTILE_ROWS, TACTILE_COLS, 3)
        return arr.at[..., 0:2].divide(3e-6).at[..., 2:3].divide(3e-3)


def make(observation_type: str = "tactile_flatten", dtype=None,
         scene_path: str = None) -> TactilePushEnv:
    """Default: the bundled Python scene (standalone); pass ``scene_path`` to
    load a redmax XML asset instead."""
    if scene_path:
        spec = xml_parser.parse_scene(scene_path)
        struct_, model = builder.build(spec, dtype=dtype)
    else:
        from ..model import task_scenes
        struct_, model = task_scenes.tactile_push()
    return TactilePushEnv(struct_, model, observation_type)
