"""StableGrasp: grasp-position bandit with randomized per-block density.

Functional re-implementation of the reference task (envs/stable_grasp_env.py):
an 11-block bar with randomized density distribution (bar COM uniform along
its length) must be grasped at a stable point; each env step executes a
scripted 180-substep grasp (move / close / lift / lower / open) and returns
the tactile shear frame captured mid-lift. Success = bar stays level.

Parity notes (reference file:line):
- density randomization scheme with COM ~ U(1, 10) blocks (:71-128)
- 500-step settle for the initial state (:166-187)
- 7-stage linear joint-target script, 180 substeps, capture at 60 (:197-233)
- shear-only obs, per-episode max-norm-30 normalization (:248-259, 289-297)
- success |rotvec| < 0.02 and lift > 0.005; reward +100 / -10*angle (:262-280)
- action: grasp position += clip(a)*0.05, bounded to +-0.11 (:142-153)

TPU-native notes: per-episode densities are Model leaf overrides carried in
EnvState (batched heterogeneous physics under vmap — the reference mutates a
single C++ sim instead, C9); the 180-substep script runs as one lax.scan.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct as fstruct

from ..model import builder, xml_parser
from ..sim import dynamics, integrators
from .base import EnvState, FunctionalEnv

TACTILE_ROWS, TACTILE_COLS = 13, 10
NUM_BLOCKS = 11
# physical left-to-right block order -> body name suffix (reference :75)
BOX_IDS = [9, 8, 1, 2, 3, 4, 5, 6, 7, 10, 11]
CAPTURE_FRAME = 60
STAGE_STEPS = [20, 10, 50, 20, 50, 10, 20]  # 180 substeps (reference :220)


@fstruct.dataclass
class GraspExtras:
    current_q: jax.Array        # (12,) persistent bar+gripper state
    grasp_position: jax.Array   # ()
    body_mass: jax.Array        # (B,) randomized masses (Model override)
    body_inertia: jax.Array     # (B, 3)
    obs: jax.Array
    is_success: jax.Array       # () bool


class StableGraspEnv(FunctionalEnv):
    max_episode_steps = 10
    action_scale = 0.05
    grasp_position_bound = 0.11

    def __init__(self, struct_, model, observation_type: str = "tactile_map"):
        super().__init__(struct_, model)
        assert observation_type in ("tactile_flatten", "tactile_map")
        self.observation_type = observation_type
        self._step_sim = integrators.build_step(struct_)
        self._box_bodies = np.array(
            [struct_.body_index(f"box_{i}") for i in BOX_IDS])
        self._box_volume = np.asarray(
            [float(model.body_mass[b]) for b in self._box_bodies]) / 600.0
        self._box_unit_inertia = np.stack(
            [np.asarray(model.body_inertia[b]) / float(model.body_mass[b])
             for b in self._box_bodies])
        self.q_init_ref, self.qdot_init_ref = self._generate_initial_state()

    # -- initial settle (reference :166-187) -------------------------------
    def _generate_initial_state(self):
        model = self.model
        q = np.asarray(model.q_init).copy()
        q[2] = 0.2
        q[4] = q[5] = -0.03
        u = jnp.asarray(np.concatenate([q[0:2], [q[2] + 0.003], [q[3]],
                                        q[4:6]]))
        state = integrators.initial_state(self.struct, model).replace(
            q=jnp.asarray(q), q_prev=jnp.asarray(q))

        def body(s, _):
            return self._step_sim(model, s, u), None

        state, _ = jax.jit(
            lambda s: jax.lax.scan(body, s, None, length=500))(state)
        return state.q, state.qdot

    # -- density randomization (reference :71-128) -------------------------
    def _sample_densities(self, key):
        dtype = self.model.q_init.dtype
        k = jax.random.split(key, 5)
        com_y = jax.random.uniform(k[0], minval=1.0, maxval=NUM_BLOCKS - 1.0,
                                   dtype=dtype)
        num_left = jnp.floor(com_y)
        mid_left_ratio = com_y - num_left
        num_right = NUM_BLOCKS - 1 - num_left
        mid_density = jax.random.uniform(k[1], minval=600.0, maxval=700.0,
                                         dtype=dtype)
        right_total = jax.random.uniform(
            k[2], minval=600.0 * num_right, maxval=700.0 * num_right,
            dtype=dtype)
        left_total = jax.random.uniform(
            k[3], minval=600.0 * num_left, maxval=700.0 * num_left,
            dtype=dtype)
        # torque balance about the mid block (reference :86-95)
        left_total = jnp.where(
            mid_left_ratio < 0.5,
            right_total + (1.0 - 2.0 * mid_left_ratio) * mid_density,
            left_total)
        right_total = jnp.where(
            mid_left_ratio < 0.5,
            right_total,
            left_total + (2.0 * mid_left_ratio - 1.0) * mid_density)

        idx = jnp.arange(NUM_BLOCKS, dtype=dtype)
        ratios = jax.random.uniform(k[4], (NUM_BLOCKS,), dtype=dtype) + 0.1
        left_mask = idx < num_left
        right_mask = idx > num_left
        left_r = jnp.where(left_mask, ratios, 0.0)
        right_r = jnp.where(right_mask, ratios, 0.0)
        dens = (left_r / jnp.maximum(jnp.sum(left_r), 1e-9) * left_total
                + right_r / jnp.maximum(jnp.sum(right_r), 1e-9) * right_total)
        dens = jnp.where(idx == num_left, mid_density, dens)
        total = jnp.sum(dens)
        dens = dens / total * jnp.clip(total, 3000.0, 7000.0)
        return dens  # (11,) physical order

    def _variation(self, densities):
        """Model-leaf overrides for the 11 boxes from densities."""
        vol = jnp.asarray(self._box_volume, densities.dtype)
        unit_I = jnp.asarray(self._box_unit_inertia, densities.dtype)
        mass = densities * vol
        bm = self.model.body_mass.at[self._box_bodies].set(mass)
        bi = self.model.body_inertia.at[self._box_bodies].set(
            mass[:, None] * unit_I)
        return bm, bi

    def _model_for(self, ex: GraspExtras):
        return self.model.replace(body_mass=ex.body_mass,
                                  body_inertia=ex.body_inertia)

    # -- scripted grasp (reference :197-282) -------------------------------
    def _grasp(self, model, current_q, grasp_position):
        dtype = current_q.dtype
        lift_height = 0.2029862 + 0.03
        grasp_height = 0.2029862
        fing = -0.008

        q0 = current_q.at[1].set(grasp_position)
        open_l, open_r = q0[4], q0[5]
        gp = grasp_position

        def tq(z, fl, fr):
            return jnp.stack([jnp.zeros((), dtype), gp, z,
                              jnp.zeros((), dtype), fl, fr])

        targets = [q0[:6],
                   tq(grasp_height, fing, fing),
                   tq(grasp_height, fing, fing),
                   tq(lift_height, fing, fing),
                   tq(lift_height, fing, fing),
                   tq(grasp_height, fing, fing),
                   tq(grasp_height, fing, fing),
                   tq(grasp_height, open_l, open_r)]
        actions = []
        for stage, n in enumerate(STAGE_STEPS):
            frac = (jnp.arange(1, n + 1, dtype=dtype) / n)[:, None]
            actions.append(targets[stage][None]
                           + frac * (targets[stage + 1] - targets[stage])[None])
        actions = jnp.concatenate(actions, axis=0)  # (180, 6)

        state = integrators.initial_state(self.struct, model).replace(
            q=q0, q_prev=q0)

        def body(carry, inp):
            s, captured_tac, captured_q = carry
            t, u = inp
            s = self._step_sim(model, s, u)
            is_cap = t == CAPTURE_FRAME
            tac = dynamics.tactile_field(self.struct, model, s.q, s.qdot)
            captured_tac = jnp.where(is_cap, tac, captured_tac)
            captured_q = jnp.where(is_cap, s.q, captured_q)
            return (s, captured_tac, captured_q), None

        T = actions.shape[0]
        ntac = len(self.struct.tac_joint)
        init = (state, jnp.zeros((ntac, 3), dtype), q0)
        (state, cap_tac, cap_q), _ = jax.lax.scan(
            body, init, (jnp.arange(T), actions))
        return state.q, cap_tac, cap_q

    def _obs_from_tactile(self, cap_tac):
        """Shear-only, normalized to max length 30 (reference :248-259,
        :289-297)."""
        shear = cap_tac.reshape(1, 2, TACTILE_ROWS, TACTILE_COLS, 3)[..., 0:2]
        max_len = jnp.max(jnp.linalg.norm(shear, axis=-1)) + 1e-5
        shear = shear / (max_len / 30.0)
        if self.observation_type == "tactile_flatten":
            return shear.reshape(-1)
        return shear.transpose(0, 1, 4, 2, 3).reshape(
            -1, TACTILE_ROWS, TACTILE_COLS)  # (4, 13, 10)

    def obs_size(self):
        if self.observation_type == "tactile_flatten":
            return (TACTILE_ROWS * TACTILE_COLS * 2 * 2,)
        return (4, TACTILE_ROWS, TACTILE_COLS)

    def _outcome(self, cap_q):
        rotvec = cap_q[9:12]
        angle = jnp.linalg.norm(rotvec)
        success = (angle < 0.02) & (cap_q[8] > 0.005)
        reward = jnp.where(success, 100.0, -angle * 10.0)
        return success, reward

    # -- api ---------------------------------------------------------------
    def reset(self, key):
        kd, knext = jax.random.split(key)
        dens = self._sample_densities(kd)
        bm, bi = self._variation(dens)
        ex = GraspExtras(
            current_q=self.q_init_ref,
            grasp_position=jnp.zeros((), self.q_init_ref.dtype),
            body_mass=bm, body_inertia=bi,
            obs=jnp.zeros(self.obs_size(), self.q_init_ref.dtype),
            is_success=jnp.zeros((), bool))
        model = self._model_for(ex)
        final_q, cap_tac, cap_q = self._grasp(model, ex.current_q,
                                              ex.grasp_position)
        obs = self._obs_from_tactile(cap_tac)
        ex = ex.replace(current_q=final_q, obs=obs)
        state = EnvState(sim=integrators.initial_state(self.struct, model),
                         key=knext, t=jnp.zeros((), jnp.int32), extras=ex)
        return state, obs

    def step(self, state: EnvState, u):
        ex = state.extras
        action = jnp.clip(u, -1.0, 1.0)
        gp = jnp.clip(ex.grasp_position + action[0] * self.action_scale,
                      -self.grasp_position_bound, self.grasp_position_bound)
        model = self._model_for(ex)
        final_q, cap_tac, cap_q = self._grasp(model, ex.current_q, gp)
        obs = self._obs_from_tactile(cap_tac)
        success, reward = self._outcome(cap_q)
        ex = ex.replace(current_q=final_q, grasp_position=gp, obs=obs,
                        is_success=success)
        info = {"success": success}
        return (state.replace(extras=ex, t=state.t + 1), obs, reward, success,
                info)


def make(observation_type: str = "tactile_map", dtype=None,
         scene_path: str = None) -> StableGraspEnv:
    """Default: the bundled Python scene (standalone); pass ``scene_path`` to
    load a redmax XML asset instead."""
    if scene_path:
        spec = xml_parser.parse_scene(scene_path)
        struct_, model = builder.build(spec, dtype=dtype)
    else:
        from ..model import task_scenes
        struct_, model = task_scenes.stable_grasp()
    return StableGraspEnv(struct_, model, observation_type)
