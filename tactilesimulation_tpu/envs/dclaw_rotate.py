"""DClaw cap rotation with abstract (mesh-vertex) tactile sensors.

Functional re-implementation of the reference task (envs/dclaw_rotate_env.py):
a 9-DoF three-finger D'Claw rotates a bottle cap >= 45 degrees; observations
include three 20x20x3 tactile flow images from per-vertex fingertip markers.

Parity notes (reference file:line):
- q_init pose [-0.5, 0.8] pattern + N(0, 0.05) noise (:74-77, :164-166)
- domain randomization: cap damping U(0.01, 0.7), radius U(0.02, 0.08),
  joint offset U(-0.02, 0.02)^2, endeffector at [radius, 0, 0] (:169-178)
- relative position control, scale 0.06, per-dof limits (:78-88, :200-207)
- reward: -0.5 per out-of-contact finger, rotation progress toward pi/4,
  action power penalty; +50 success at pi/4, -50 if a fingertip rises above
  the cap top surface z = 0.05 (:122-162)
- frame_skip 5 (:59)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct as fstruct

from ..model import builder, xml_parser
from ..sim import dynamics, integrators, kinematics
from .base import EnvState, FunctionalEnv

ROWS, COLS = 20, 20
DOF_LIMIT = np.array([[-0.45, 1.35], [-2, 2], [1, 2]] * 3, dtype=np.float64)
CAP_TOP_Z = 0.05
MAX_ANGLE = np.pi / 4


@fstruct.dataclass
class DClawExtras:
    dof_damping: jax.Array   # Model override
    body_size: jax.Array
    joint_pos: jax.Array
    ee_pos: jax.Array
    tactile_imgs: jax.Array  # (3, 20, 20, 3) last flow images


class DClawRotateEnv(FunctionalEnv):
    max_episode_steps = 200
    frame_skip = 5
    action_dim = 9
    relative_q_scale = 0.06
    rot_coef = 1.0
    power_coef = 0.005

    def __init__(self, struct_, model, observation_type: str = "tactile",
                 torque_control: bool = False, relative_control: bool = True):
        super().__init__(struct_, model)
        assert observation_type in ("tactile", "tactile_flatten", "no_tactile")
        self.observation_type = observation_type
        self.is_torque_control = torque_control
        self.relative_control = relative_control
        self._step_sim = integrators.build_step(struct_)
        self._cap_joint = struct_.joint_index("cap")
        self._cap_body = struct_.body_index("cap")
        self._cap_ee = struct_.ee_names.index("cap")
        # scatter indices for flow images (static)
        self._img_idx = []
        for s in struct_.sensors:
            ip = np.asarray(s.image_pos)
            self._img_idx.append((s.marker_start, s.marker_count, ip))
        q = np.zeros(struct_.ndof_q)
        q[[1, 4, 7]] = -0.5
        q[[2, 5, 8]] = 0.8
        self.q_init = q

    def obs_size(self):
        if self.observation_type == "no_tactile":
            return (18,)
        return (18 + 3 * ROWS * COLS * 3,)

    def _model_for(self, ex: DClawExtras):
        return self.model.replace(
            dof_damping=ex.dof_damping, body_size=ex.body_size,
            joint_pos=ex.joint_pos, ee_pos=ex.ee_pos)

    def _flow_images(self, model, q, qdot):
        field = dynamics.tactile_field(self.struct, model, q, qdot)
        imgs = []
        for start, count, ip in self._img_idx:
            img = jnp.zeros((ROWS, COLS, 3), field.dtype)
            img = img.at[ip[:, 0], ip[:, 1]].add(field[start:start + count])
            imgs.append(img)
        return jnp.stack(imgs)  # (3, 20, 20, 3)

    def _get_obs(self, model, q, qdot, imgs):
        var = kinematics.ee_positions(self.struct, model, q)
        base = jnp.concatenate([q[:9], var[:9]])
        if self.observation_type == "no_tactile":
            return base
        if self.observation_type == "tactile":
            tac = imgs.transpose(0, 3, 1, 2).reshape(-1)  # (9,20,20) flat
        else:
            tac = imgs.reshape(-1)
        return jnp.concatenate([base, tac])

    # -- api ---------------------------------------------------------------
    def reset(self, key):
        kq, kd, kr, kxy, knext = jax.random.split(key, 5)
        dtype = self.model.q_init.dtype
        q = jnp.asarray(self.q_init, dtype)
        q = q.at[0:9].add(0.05 * jax.random.normal(kq, (9,), dtype))

        damping = jax.random.uniform(kd, minval=0.01, maxval=0.7, dtype=dtype)
        radius = jax.random.uniform(kr, minval=0.02, maxval=0.08, dtype=dtype)
        dxy = jax.random.uniform(kxy, (2,), minval=-0.02, maxval=0.02,
                                 dtype=dtype)

        cap_dof = self.struct.joint_dof_offset[self._cap_joint]
        dof_damping = self.model.dof_damping.at[cap_dof].set(damping)
        body_size = self.model.body_size.at[self._cap_body, 0].set(radius)
        joint_pos = self.model.joint_pos.at[self._cap_joint].set(
            jnp.concatenate([dxy, jnp.asarray([0.075], dtype)]))
        ee_pos = self.model.ee_pos.at[self._cap_ee].set(
            jnp.stack([radius, jnp.zeros((), dtype), jnp.zeros((), dtype)]))
        ex = DClawExtras(dof_damping=dof_damping, body_size=body_size,
                         joint_pos=joint_pos, ee_pos=ee_pos,
                         tactile_imgs=jnp.zeros((3, ROWS, COLS, 3), dtype))
        model = self._model_for(ex)
        sim = integrators.initial_state(self.struct, model).replace(
            q=q, q_prev=q)
        imgs = self._flow_images(model, q, jnp.zeros_like(q))
        ex = ex.replace(tactile_imgs=imgs)
        obs = self._get_obs(model, q, jnp.zeros_like(q), imgs)
        return EnvState(sim=sim, key=knext, t=jnp.zeros((), jnp.int32),
                        extras=ex), obs

    def step(self, state: EnvState, u):
        ex = state.extras
        model = self._model_for(ex)
        dtype = state.sim.q.dtype
        action = jnp.clip(u, -1.0, 1.0)
        lim = jnp.asarray(DOF_LIMIT, dtype)
        if self.is_torque_control:
            target = action
        elif self.relative_control:
            target = jnp.clip(state.sim.q[:9] + action * self.relative_q_scale,
                              lim[:, 0], lim[:, 1])
        else:
            target = 0.5 * (action + 1.0) * (lim[:, 1] - lim[:, 0]) + lim[:, 0]

        sim, _ = jax.lax.scan(
            lambda s, _: (self._step_sim(model, s, target), None),
            state.sim, None, length=self.frame_skip)

        imgs = self._flow_images(model, sim.q, sim.qdot)
        obs = self._get_obs(model, sim.q, sim.qdot, imgs)

        # reward (reference :122-162)
        var = kinematics.ee_positions(self.struct, model, sim.q)
        fingertip_z = var[:9][2::3]
        cap_angle = sim.q[-1]
        finger_force = jnp.sum(jnp.linalg.norm(imgs, axis=-1), axis=(1, 2))
        not_in_contact = (finger_force < 1.0).astype(dtype)
        reward = -0.5 * jnp.sum(not_in_contact)
        reward += -self.rot_coef * jnp.minimum(cap_angle - MAX_ANGLE, 0.0) ** 2
        reward += -self.power_coef * jnp.sum(u ** 2)
        lifted = jnp.any(fingertip_z > CAP_TOP_Z)
        success = cap_angle > MAX_ANGLE
        reward = reward + jnp.where(lifted, -50.0, 0.0)
        reward = reward + jnp.where(success, 50.0, 0.0)
        done = lifted | success
        info = {"success": success}
        new_state = state.replace(
            sim=sim, t=state.t + 1,
            extras=ex.replace(tactile_imgs=imgs))
        return new_state, obs, reward, done, info


def make(observation_type: str = "tactile", torque_control: bool = False,
         relative_control: bool = True, dtype=None,
         scene_path: str = None) -> DClawRotateEnv:
    """Default: the bundled procedural D'Claw (standalone; idealized link
    geometry — the reference's meshes are absent from its checkout). Pass
    ``scene_path`` to load original dclaw_*_control.xml assets (with their
    contact/tactile sidecar files) instead."""
    if scene_path:
        spec = xml_parser.parse_scene(scene_path)
        struct_, model = builder.build(spec, dtype=dtype)
    else:
        from ..model import task_scenes
        struct_, model = task_scenes.dclaw()
    return DClawRotateEnv(struct_, model, observation_type, torque_control,
                          relative_control)
