"""TactileInsertion: sim-to-real peg-in-hole from relative tactile frames.

Functional re-implementation of the reference task
(envs/tactile_insertion_env.py): each env step re-executes a scripted 45-step
insertion from an adjusted start pose; observations are *relative* tactile
shear frames (minus a reference frame) at masked substeps, with optional
observation noise, per-episode normalization, and full contact/tactile domain
randomization.

Parity notes (reference file:line):
- initial pose: grasp + lift settle (:126-170)
- reset noise: xy ~ U(+-0.006), z ~ U(-0.0002, 0.0002), rot ~ U(+-pi/18),
  grasp height ~ U(-0.01, 0.005) (:202-216)
- domain randomization ranges (:238-281)
- tactile masks: reference frame 6, obs frames spaced over [initial, 45]
  (:75-77); relative frames = captured - captured[0], drop first (:361-365)
- action modes relative/accumulative with workspace clipping (:294-328)
- success: |x|,|y| <= 0.0022 (translation) or z < 0.0247 (rotation) (:387-390)
- reward absolute / delta (:400-409)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct as fstruct

from ..model import builder, xml_parser
from ..sim import dynamics, integrators, spatial
from .base import EnvState, FunctionalEnv

ROWS, COLS = 13, 10
EXEC_STEPS = 45


@fstruct.dataclass
class InsertionExtras:
    current_q_init: jax.Array     # (12,) commanded start pose
    original_q_init: jax.Array
    prev_object_pose: jax.Array   # (3,) x, y, rot
    pair_kn: jax.Array            # Model overrides (domain randomization)
    pair_kt: jax.Array
    pair_mu: jax.Array
    pair_damping: jax.Array
    tac_kn: jax.Array
    tac_kt: jax.Array
    tac_mu: jax.Array
    tac_damping: jax.Array
    grasp_force: jax.Array        # ()
    obs: jax.Array
    is_success: jax.Array


class TactileInsertionEnv(FunctionalEnv):
    max_episode_steps = 15
    working_space_boundary = 0.015
    working_rotation_boundary = np.pi / 12.0
    max_error = np.array([0.006, 0.006, np.pi / 18.0])
    grasp_force_range = (1.0 / 8.0, 0.8)

    def __init__(self, struct_, model, observation_type: str = "tactile_map",
                 observation_noise: bool = True,
                 normalize_tactile_obs: bool = True,
                 allow_translation: bool = True, allow_rotation: bool = False,
                 num_obs_frames: int = 5, action_xy_scale: float = 0.02,
                 action_rot_scale: float = np.pi / 18.0,
                 action_type: str = "relative", reward_type: str = "absolute",
                 domain_randomization: bool = False):
        super().__init__(struct_, model)
        assert observation_type in ("tactile_flatten", "tactile_map")
        self.observation_type = observation_type
        self.observation_noise = observation_noise
        self.normalize_tactile_obs = normalize_tactile_obs
        self.allow_translation = allow_translation
        self.allow_rotation = allow_rotation
        self.action_type = action_type
        self.reward_type = reward_type
        self.domain_randomization = domain_randomization
        self.tactile_samples = num_obs_frames
        initial_frame = 15 if observation_type == "tactile_flatten" else 12
        freq = (EXEC_STEPS - initial_frame) // num_obs_frames
        mask_frames = list(range(initial_frame + freq - 1, EXEC_STEPS, freq))[
            :num_obs_frames]
        self.capture_frames = np.asarray([6] + mask_frames)  # ref frame first

        if allow_translation:
            self.action_dim = 3 if allow_rotation else 2
            scale = [action_xy_scale, action_xy_scale]
            if allow_rotation:
                scale.append(action_rot_scale)
        else:
            assert allow_rotation
            self.action_dim = 1
            scale = [action_rot_scale]
        self.action_scale = np.asarray(scale)

        self._step_sim = integrators.build_step(struct_)
        # pad-box contact pair indices for domain randomization (:254-263)
        box = struct_.body_index("box")
        pads = [struct_.body_index("tactile_pad_left"),
                struct_.body_index("tactile_pad_right")]
        self._dr_pairs = [p.param_index for p in struct_.pairs
                          if p.primitive_body == box and p.general_body in pads]
        self.q_init_ref = self._generate_initial_pose()

    # -- initial pose (reference :126-170) ---------------------------------
    def _generate_initial_pose(self):
        """Grasp + lift settle (1000 implicit substeps). The result is a
        deterministic function of (struct, model), so it is disk-cached —
        recomputing it costs minutes of XLA compile+run per process."""
        import hashlib
        model = self.model
        leaves = jax.tree.leaves(model)
        hsh = hashlib.sha256()
        for leaf in leaves:
            arr = np.asarray(leaf, np.float64)
            hsh.update(arr.tobytes() + str(arr.shape).encode())
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "tactilesimulation_tpu",
                             f"insertion_qinit_{hsh.hexdigest()[:16]}.npy")
        if os.path.exists(cache):
            return jnp.asarray(np.load(cache), model.q_init.dtype)
        q = self._generate_initial_pose_uncached()
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.save(cache, np.asarray(q))
        return q

    def _generate_initial_pose_uncached(self):
        model = self.model
        dtype = model.q_init.dtype
        q = np.asarray(model.q_init).copy()
        grasp_height = 0.2
        q[2] = grasp_height
        q[4] = q[5] = -0.03
        state = integrators.initial_state(self.struct, model).replace(
            q=jnp.asarray(q, dtype), q_prev=jnp.asarray(q, dtype))

        stages = [np.array([q[0], q[1], q[2], q[3], 0.0, 0.0]),
                  np.array([0.0, 0.0, grasp_height, 0.0, 0.0, 0.0]),
                  np.array([0.0, 0.0, grasp_height, 0.0, 1.0, 1.0]),
                  np.array([0.0, 0.0, grasp_height, 0.0, 1.0, 1.0])]
        steps = [100, 100, 300]
        us = []
        for stage, n in enumerate(steps):
            frac = (np.arange(1, n + 1) / n)[:, None]
            us.append(stages[stage][None]
                      + frac * (stages[stage + 1] - stages[stage])[None])
        us = jnp.asarray(np.concatenate(us), dtype)

        def body(s, u):
            return self._step_sim(model, s, u), None

        state, _ = jax.jit(lambda s, us: jax.lax.scan(body, s, us))(state, us)

        q1 = np.asarray(state.q).copy()
        q1[2] += 0.026 + 0.003
        q1[8] += 0.026 + 0.003
        state = integrators.initial_state(self.struct, model).replace(
            q=jnp.asarray(q1, dtype), q_prev=jnp.asarray(q1, dtype))
        u_hold = np.asarray(q1[:6]).copy()
        u_hold[4:6] = 1.0
        u_hold = jnp.asarray(u_hold, dtype)
        state, _ = jax.jit(lambda s: jax.lax.scan(
            lambda ss, _: (self._step_sim(model, ss, u_hold), None), s, None,
            length=500))(state)
        return state.q

    # -- helpers -----------------------------------------------------------
    @staticmethod
    def _apply_relative_motion(q, rel_pos, rel_rot, grasp_height_noise=0.0):
        """(reference :178-197) — rel_pos is (2,) or (3,)."""
        new_q = q
        if rel_pos.shape[0] == 2:
            new_q = new_q.at[0:2].add(rel_pos)
            new_q = new_q.at[6:8].add(rel_pos)
        else:
            new_q = new_q.at[0:3].add(rel_pos)
            new_q = new_q.at[6:9].add(rel_pos)
        new_q = new_q.at[2].add(grasp_height_noise)
        new_q = new_q.at[3].add(rel_rot)
        zrot = jnp.stack([jnp.zeros_like(rel_rot), jnp.zeros_like(rel_rot),
                          rel_rot])
        new_q = new_q.at[9:12].set(spatial.rotvec_mul(q[9:12], zrot))
        return new_q

    def _model_for(self, ex: InsertionExtras):
        return self.model.replace(
            pair_kn=ex.pair_kn, pair_kt=ex.pair_kt, pair_mu=ex.pair_mu,
            pair_damping=ex.pair_damping, tac_kn=ex.tac_kn, tac_kt=ex.tac_kt,
            tac_mu=ex.tac_mu, tac_damping=ex.tac_damping)

    def _execute(self, model, q_init, grasp_force, key):
        """45-substep scripted insertion; returns (final_q, obs)."""
        dtype = q_init.dtype
        init_jp = q_init[:6]
        target = init_jp.at[2].add(-0.0011)
        frac = (jnp.arange(1, EXEC_STEPS + 1, dtype=dtype) / EXEC_STEPS)[:, None]
        us = init_jp[None] + frac * (target - init_jp)[None]
        us = us.at[:, 2].add(0.003)
        us = us.at[:, 4].set(grasp_force)
        us = us.at[:, 5].set(grasp_force)

        state = integrators.initial_state(self.struct, model).replace(
            q=q_init, q_prev=q_init)

        def body(s, u):
            s = self._step_sim(model, s, u)
            tac = dynamics.tactile_field(self.struct, model, s.q, s.qdot)
            return s, tac

        state, tacs = jax.lax.scan(body, state, us)
        captured = tacs[jnp.asarray(self.capture_frames)]  # (S+1, M, 3)
        return state.q, self._obs_from_captured(captured, key)

    def _obs_from_captured(self, captured, key):
        """Captured tactile frames (S+1, M, 3) -> observation (relative
        shear frames, noise, per-episode normalization; reference :361-377).
        Shared with the lane-major vec env (vmapped per lane there)."""
        dtype = captured.dtype
        rel = captured[1:] - captured[0:1]
        shear = rel.reshape(self.tactile_samples, 2, ROWS, COLS, 3)[..., 0:2]
        if self.observation_noise:
            shear = shear + 1e-5 * jax.random.normal(key, shear.shape, dtype)
        if self.normalize_tactile_obs:
            max_len = jnp.max(jnp.linalg.norm(shear, axis=-1)) + 1e-5
            shear = shear / (max_len / 30.0)
        if self.observation_type == "tactile_flatten":
            return shear.reshape(-1)
        return shear.transpose(0, 1, 4, 2, 3).reshape(-1, ROWS, COLS)

    def obs_size(self):
        if self.observation_type == "tactile_flatten":
            return (ROWS * COLS * 2 * 2 * self.tactile_samples,)
        return (2 * 2 * self.tactile_samples, ROWS, COLS)

    def _outcome(self, final_q, q_cmd, prev_pose):
        pose = jnp.stack([q_cmd[0], q_cmd[1], q_cmd[3]])
        me = jnp.asarray(self.max_error, final_q.dtype)
        if not self.allow_rotation:
            success = ((jnp.abs(final_q[6]) <= 0.0022)
                       & (jnp.abs(final_q[7]) <= 0.0022))
        else:
            success = final_q[8] < 0.0247
        if self.reward_type == "absolute":
            reward = (-jnp.sum(q_cmd[0:2] ** 2) * 10000.0
                      - q_cmd[3] ** 2 * 20.0)
        else:
            reward = (jnp.linalg.norm(prev_pose / me)
                      - jnp.linalg.norm(pose / me)) * 10.0
            reward = reward + jnp.where(success, 20.0, -1.0)
        improve = jnp.linalg.norm(prev_pose / me) > jnp.linalg.norm(pose / me)
        return success, reward, pose, improve

    # -- api ---------------------------------------------------------------
    def _sample_reset(self, key):
        """Per-episode reset sampling (pose noise + domain randomization,
        reference :202-216, :238-281) WITHOUT the scripted execution — shared
        by ``reset`` and the lane-major vec env
        (envs/tactile_insertion_lanes.py)."""
        kp, kr, kh, kdr, kobs, knext = jax.random.split(key, 6)
        dtype = self.q_init_ref.dtype
        if self.allow_translation:
            pos_noise = jax.random.uniform(
                kp, (3,), minval=jnp.asarray([-0.006, -0.006, -0.0002]),
                maxval=jnp.asarray([0.006, 0.006, 0.0002]), dtype=dtype)
        else:
            pos_noise = jnp.zeros(2, dtype)
        rot_noise = (jax.random.uniform(kr, minval=-self.max_error[2],
                                        maxval=self.max_error[2], dtype=dtype)
                     if self.allow_rotation else jnp.zeros((), dtype))
        height_noise = jax.random.uniform(kh, minval=-0.01, maxval=0.005,
                                          dtype=dtype)
        q_cmd = self._apply_relative_motion(self.q_init_ref, pos_noise,
                                            rot_noise, height_noise)

        m = self.model
        pair_kn, pair_kt = m.pair_kn, m.pair_kt
        pair_mu, pair_damping = m.pair_mu, m.pair_damping
        tac = [m.tac_kn, m.tac_kt, m.tac_mu, m.tac_damping]
        grasp_force = jnp.asarray(1.0, dtype)
        if self.domain_randomization:
            ks = jax.random.split(kdr, 9)
            ckn = jax.random.uniform(ks[0], minval=2e3, maxval=14e3, dtype=dtype)
            ckt = jax.random.uniform(ks[1], minval=20.0, maxval=140.0, dtype=dtype)
            cmu = jax.random.uniform(ks[2], minval=0.5, maxval=2.5, dtype=dtype)
            cda = jnp.asarray(1e3, dtype)
            idx = jnp.asarray(self._dr_pairs)
            pair_kn = pair_kn.at[idx].set(ckn)
            pair_kt = pair_kt.at[idx].set(ckt)
            pair_mu = pair_mu.at[idx].set(cmu)
            pair_damping = pair_damping.at[idx].set(cda)
            tkn = jax.random.uniform(ks[3], minval=50.0, maxval=450.0, dtype=dtype)
            tkt = jax.random.uniform(ks[4], minval=0.2, maxval=2.3, dtype=dtype)
            tmu = jax.random.uniform(ks[5], minval=0.5, maxval=2.5, dtype=dtype)
            tda = jax.random.uniform(ks[6], minval=0.0, maxval=100.0, dtype=dtype)
            tac = [jnp.full_like(m.tac_kn, tkn), jnp.full_like(m.tac_kt, tkt),
                   jnp.full_like(m.tac_mu, tmu),
                   jnp.full_like(m.tac_damping, tda)]
            grasp_force = jax.random.uniform(
                ks[7], minval=self.grasp_force_range[0],
                maxval=self.grasp_force_range[1], dtype=dtype)
        return dict(q_cmd=q_cmd, pair_kn=pair_kn, pair_kt=pair_kt,
                    pair_mu=pair_mu, pair_damping=pair_damping,
                    tac_kn=tac[0], tac_kt=tac[1], tac_mu=tac[2],
                    tac_damping=tac[3], grasp_force=grasp_force,
                    kobs=kobs, knext=knext)

    def reset(self, key):
        s = self._sample_reset(key)
        q_cmd, dtype = s["q_cmd"], self.q_init_ref.dtype
        ex = InsertionExtras(
            current_q_init=q_cmd, original_q_init=q_cmd,
            prev_object_pose=jnp.stack([q_cmd[0], q_cmd[1], q_cmd[3]]),
            pair_kn=s["pair_kn"], pair_kt=s["pair_kt"], pair_mu=s["pair_mu"],
            pair_damping=s["pair_damping"], tac_kn=s["tac_kn"],
            tac_kt=s["tac_kt"], tac_mu=s["tac_mu"],
            tac_damping=s["tac_damping"], grasp_force=s["grasp_force"],
            obs=jnp.zeros(self.obs_size(), dtype),
            is_success=jnp.zeros((), bool))
        model = self._model_for(ex)
        final_q, obs = self._execute(model, q_cmd, s["grasp_force"],
                                     s["kobs"])
        ex = ex.replace(obs=obs)
        return EnvState(sim=integrators.initial_state(self.struct, model),
                        key=s["knext"], t=jnp.zeros((), jnp.int32),
                        extras=ex), obs

    def _apply_action(self, current_q_init, original_q_init, u):
        """Action -> commanded start pose q_cmd (reference :294-328). Shared
        with the lane-major vec env (vmapped per lane there)."""
        dtype = current_q_init.dtype
        action = jnp.clip(u, -1.0, 1.0) * jnp.asarray(self.action_scale, dtype)
        if self.allow_translation:
            if self.action_type == "relative":
                rel_xy = jnp.clip(
                    action[0:2],
                    -self.working_space_boundary - current_q_init[0:2],
                    self.working_space_boundary - current_q_init[0:2])
            else:
                rel_xy = action[0:2]
            base_idx = 2
        else:
            rel_xy = jnp.zeros(2, dtype)
            base_idx = 0
        if self.allow_rotation:
            rel_rot = action[base_idx]
            if self.action_type == "relative":
                rel_rot = jnp.clip(
                    rel_rot,
                    -self.working_rotation_boundary - current_q_init[3],
                    self.working_rotation_boundary)
        else:
            rel_rot = jnp.zeros((), dtype)
        base_q = (current_q_init if self.action_type == "relative"
                  else original_q_init)
        return self._apply_relative_motion(base_q, rel_xy, rel_rot)

    def step(self, state: EnvState, u):
        ex = state.extras
        kobs, knext = jax.random.split(state.key)
        q_cmd = self._apply_action(ex.current_q_init, ex.original_q_init, u)

        model = self._model_for(ex)
        final_q, obs = self._execute(model, q_cmd, ex.grasp_force, kobs)
        success, reward, pose, improve = self._outcome(
            final_q, q_cmd, ex.prev_object_pose)
        prev_pose = ex.prev_object_pose  # pose the policy had to correct
        ex = ex.replace(current_q_init=q_cmd, prev_object_pose=pose, obs=obs,
                        is_success=success)
        info = {"success": success, "improve": improve,
                # misalignment-class evaluation input (reference
                # ppo_rnn.py:316-333 bins this into the 3x3 matrices)
                "prev_object_pose": prev_pose}
        return (state.replace(extras=ex, key=knext, t=state.t + 1), obs,
                reward, success, info)


def make(observation_type: str = "tactile_map", dtype=None,
         scene_path: str = None, **kwargs) -> TactileInsertionEnv:
    """Default: the bundled Python scene (standalone); pass ``scene_path`` to
    load a redmax XML asset instead."""
    if scene_path:
        spec = xml_parser.parse_scene(scene_path)
        struct_, model = builder.build(spec, dtype=dtype)
    else:
        from ..model import task_scenes
        struct_, model = task_scenes.tactile_insertion()
    return TactileInsertionEnv(struct_, model, observation_type, **kwargs)
