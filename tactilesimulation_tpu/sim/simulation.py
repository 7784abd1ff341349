"""Simulation front-ends.

Two layers:

- ``Simulator``: the TPU-native functional API. Jitted closures over a static
  ``Structure``: ``step``, ``rollout_dense``, ``rollout_strided`` (lax.scan,
  optional rematerialization for long-horizon BPTT), tactile/variable queries.
  Everything composes with jit/vmap/grad/shard_map — this is what the envs and
  algorithms use.

- ``Simulation``: a host-side facade mirroring the reference ``redmax_py``
  binding surface (SURVEY.md §2.3: set_state_init / reset / set_u / forward /
  get_q / get_variables / get_tactile_force_vector / backward_info / backward /
  backward_steps / saveBackwardCache / update_* ...), so reference-style
  driver code ports over verbatim. Differentiation is native: ``backward()``
  re-runs the recorded episode under ``jax.vjp`` instead of consulting a C++
  adjoint tape.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model import builder, xml_parser
from . import dynamics, integrators, kinematics
from .types import Model, SimState, Structure


class Simulator:
    """Functional simulation API bound to one scene structure."""

    def __init__(self, struct: Structure, model: Model,
                 points_major: Optional[bool] = None):
        self.struct = struct
        self.model = model
        # dense marker fields (e.g. the 200x200 rolling-ball pad): evaluate
        # contact in the (3, N) points-in-lanes layout so forward AND BPTT
        # are lane-efficient (sim/dense_single.py). Small scenes keep the
        # row-major path (identical numerics; parity-tested).
        if points_major is None:
            points_major = (len(struct.cp_joint) + len(struct.tac_joint)
                            >= 2048)
        self.points_major = points_major
        self._step = integrators.build_step(struct, points_major=points_major)
        self.step = jax.jit(self._step)
        self.tactile = jax.jit(self._tactile)
        self.variables = jax.jit(
            lambda model, state: kinematics.ee_positions(struct, model, state.q))

    # -- state ------------------------------------------------------------
    def init_state(self, model: Optional[Model] = None,
                   q: Optional[jnp.ndarray] = None,
                   qdot: Optional[jnp.ndarray] = None) -> SimState:
        model = self.model if model is None else model
        state = integrators.initial_state(self.struct, model)
        if q is not None:
            q = jnp.asarray(q, state.q.dtype)
            state = state.replace(q=q, q_prev=q)
        if qdot is not None:
            qdot = jnp.asarray(qdot, state.q.dtype)
            state = state.replace(qdot=qdot, qdot_prev=qdot)
        return state

    def _tactile(self, model: Model, state: SimState):
        if self._use_fast_tactile():
            from ..ops import tactile_query
            return tactile_query.tactile_field(
                self.struct, model, state.q, state.qdot).reshape(-1)
        return self._tactile_field(model, state.q, state.qdot).reshape(-1)

    def _tactile_field(self, model, q, qdot):
        """Differentiable tactile field in the layout matching the step."""
        if self.points_major:
            from . import dense_single
            return dense_single.tactile_field_points_major(
                self.struct, model, q, qdot)
        return dynamics.tactile_field(self.struct, model, q, qdot)

    def _use_fast_tactile(self) -> bool:
        """Pallas fused query on TPU (query path only — never under grad)."""
        from ..ops import tactile_query
        return (jax.default_backend() == "tpu"
                and tactile_query.supported(self.struct))

    # -- rollouts ---------------------------------------------------------
    def make_rollout_dense(self, remat: bool = True, with_tactile: bool = True):
        """(model, state0, us (T,nu)) -> (state_T, qs (T,n), vars (T,nvar),
        tactiles (T,ntac)). Mirrors EpisodicSimFunction's per-step outputs
        (redmax_torch_functions.py:43-62); tactile masking is a cheap gather
        on the stacked output."""
        struct, step = self.struct, self._step

        def body(carry, u):
            state = step(carry[0], carry[1], u)
            tac = (self._tactile_field(carry[0], state.q, state.qdot)
                   .reshape(-1) if with_tactile
                   else jnp.zeros((0,), state.q.dtype))
            out = (state.q, kinematics.ee_positions(struct, carry[0], state.q), tac)
            return (carry[0], state), out

        fbody = jax.checkpoint(body) if remat else body

        def rollout(model, state0, us):
            (_, state), outs = jax.lax.scan(fbody, (model, state0), us)
            return (state,) + outs

        return rollout

    def make_rollout_states(self):
        """(model, state0, us (T,nu)) -> SimState with (T, ...) leaves: the
        full state after every step, as ONE scanned device program. Used by
        the facade's multi-step ``forward`` so ported drivers that call
        ``sim.forward(180)`` (StableGrasp-style macro steps) don't pay a
        host dispatch per substep."""
        step = self._step

        def rollout(model, state0, us):
            def body(s, u):
                s2 = step(model, s, u)
                return s2, s2

            _, stacked = jax.lax.scan(body, state0, us)
            return stacked

        return rollout

    def make_rollout_strided(self, stride: int, remat: bool = True,
                             fast_tactile: bool = False):
        """(model, state0, us (K,nu)) -> outputs at chunk ends only; each
        control is held for ``stride`` sim steps — StepSimFunction semantics
        (frame_skip + save_last_frame_var_only, redmax_torch_functions.py:132).

        ``fast_tactile`` switches the tactile query to the fused Pallas
        kernel — forward-only rollouts (FPS benchmark); not differentiable."""
        struct, step = self.struct, self._step
        fast = fast_tactile and self._use_fast_tactile()

        def chunk(carry, u):
            model, state = carry

            def inner(state, _):
                return step(model, state, u), None

            state, _ = jax.lax.scan(inner, state, None, length=stride)
            if fast:
                from ..ops import tactile_query
                tac = tactile_query.tactile_field(
                    struct, model, state.q, state.qdot).reshape(-1)
            else:
                tac = self._tactile_field(
                    model, state.q, state.qdot).reshape(-1)
            out = (state.q, kinematics.ee_positions(struct, model, state.q), tac)
            return (model, state), out

        fchunk = jax.checkpoint(chunk) if remat else chunk

        def rollout(model, state0, us):
            (_, state), outs = jax.lax.scan(fchunk, (model, state0), us)
            return (state,) + outs

        return rollout


# ---------------------------------------------------------------------------
# redmax_py-style host facade
# ---------------------------------------------------------------------------

class _Options:
    def __init__(self, h):
        self.h = h


class _ViewerOptions:
    """Replay/recording knobs (reference C11). Rendering itself is offline —
    see utils/renderer.py."""

    def __init__(self):
        self.fps = 30
        self.speed = 1.0
        self.loop = False
        self.infinite = False
        self.record = False
        self.record_folder = "."
        self.camera_pos = np.array([2.0, -2.5, 2.0])
        self.camera_lookat = np.array([0.0, 0.0, 0.0])


class _BackwardInfo:
    def __init__(self):
        self.flag_q0 = False
        self.flag_qdot0 = False
        self.flag_p = False
        self.flag_u = True
        self.df_dq = None
        self.df_dvar = None
        self.df_dtactile = None
        self.df_dq0 = None
        self.df_dqdot0 = None
        self.df_du = None

    def set_flags(self, flag_q0, flag_qdot0, flag_p, flag_u):
        self.flag_q0, self.flag_qdot0 = flag_q0, flag_qdot0
        self.flag_p, self.flag_u = flag_p, flag_u


class _BackwardResults:
    def __init__(self):
        self.df_dq0 = None
        self.df_dqdot0 = None
        self.df_du = None
        self.df_dp = None  # design-parameter gradients (Model cotangent)


@dataclasses.dataclass
class _EpisodeRecord:
    q0: np.ndarray
    qdot0: np.ndarray
    us: List[np.ndarray]
    state_snapshots: List[SimState]  # state BEFORE each recorded step


class Simulation:
    """Host facade with the reference binding surface (SURVEY.md §2.3).

    Cited parity: ctor (C1), dof properties + state access (C2), forward /
    set_u / reset (C3), tactile queries (C6), backward engine (C7) including
    design-parameter gradients, backward cache (C8), runtime model editing
    (C9), variables/virtual objects (C10), viewer options (C11).
    """

    def __init__(self, model_path: str, verbose: bool = False, dtype=None):
        if isinstance(model_path, tuple):
            self.struct, self.model = model_path  # pre-built (struct, model)
        else:
            spec = xml_parser.parse_scene(model_path)
            self.struct, self.model = builder.build(spec, dtype=dtype)
        self.sim = Simulator(self.struct, self.model)
        self.options = _Options(float(self.model.h))
        self.viewer_options = _ViewerOptions()
        self.backward_info = _BackwardInfo()
        self.backward_results = _BackwardResults()
        self._q_init = np.asarray(self.model.q_init)
        self._qdot_init = np.asarray(self.model.qdot_init)
        self._state = self.sim.init_state(self.model)
        self._u = np.zeros(self.struct.ndof_u)
        self._episode: Optional[_EpisodeRecord] = None
        self._cache: List[_EpisodeRecord] = []
        self._trajectory: List[np.ndarray] = []  # q history for replay
        if verbose:
            s = self.struct
            print(f"[tsim] scene '{s.name}': integrator={s.integrator} "
                  f"h={self.options.h} ndof_r={s.ndof_q} ndof_u={s.ndof_u} "
                  f"ndof_var={s.ndof_var} ndof_tactile={s.ndof_tactile} "
                  f"bodies={s.nbodies}")

    # -- dof properties (C2) ----------------------------------------------
    @property
    def ndof_r(self):
        return self.struct.ndof_q

    @property
    def ndof_u(self):
        return self.struct.ndof_u

    @property
    def ndof_var(self):
        return self.struct.ndof_var

    @property
    def ndof_tactile(self):
        return self.struct.ndof_tactile

    # -- state access ------------------------------------------------------
    def get_q(self):
        return np.asarray(self._state.q)

    def get_qdot(self):
        return np.asarray(self._state.qdot)

    def get_q_init(self):
        return self._q_init.copy()

    def set_q_init(self, q):
        self._q_init = np.asarray(q, dtype=np.float64).copy()

    def set_state_init(self, q, qdot):
        self._q_init = np.asarray(q, dtype=np.float64).copy()
        self._qdot_init = np.asarray(qdot, dtype=np.float64).copy()

    def get_variables(self):
        return np.asarray(self.sim.variables(self.model, self._state))

    # -- stepping (C3) -----------------------------------------------------
    def reset(self, backward_flag: bool = False):
        self._state = self.sim.init_state(self.model, self._q_init, self._qdot_init)
        self._trajectory = [self._q_init.copy()]
        if backward_flag:
            self._episode = _EpisodeRecord(
                q0=self._q_init.copy(), qdot0=self._qdot_init.copy(),
                us=[], state_snapshots=[self._state])
        else:
            self._episode = None

    def set_u(self, u):
        self._u = np.asarray(u, dtype=np.float64).copy()

    def forward(self, num_steps: int, verbose: bool = False,
                test_derivatives: bool = False,
                save_last_frame_var_only: bool = False):
        del verbose, save_last_frame_var_only
        if num_steps > 1:
            # one scanned device program instead of num_steps host dispatches
            if not hasattr(self, "_rollout_states"):
                self._rollout_states = jax.jit(self.sim.make_rollout_states())
            dtype = self._state.q.dtype
            us = jnp.broadcast_to(jnp.asarray(self._u, dtype),
                                  (num_steps, self.struct.ndof_u))
            stacked = self._rollout_states(self.model, self._state, us)
            states = [jax.tree.map(lambda x: x[i], stacked)
                      for i in range(num_steps)]
            if self._episode is not None:
                self._episode.us.extend([self._u.copy()] * num_steps)
                self._episode.state_snapshots.extend(
                    [self._state] + states[:-1])
            self._state = states[-1]
            self._trajectory.extend(np.asarray(stacked.q))
        else:
            for _ in range(num_steps):
                if self._episode is not None:
                    self._episode.us.append(self._u.copy())
                    self._episode.state_snapshots.append(self._state)
                self._state = self.sim.step(self.model, self._state, self._u)
                self._trajectory.append(np.asarray(self._state.q))
        if test_derivatives:
            self._test_derivatives()

    # -- tactile queries (C6) ----------------------------------------------
    def get_tactile_force_vector(self):
        return np.asarray(self.sim.tactile(self.model, self._state))

    def get_tactile_image_pos(self, name: str):
        s = self.struct.sensors[self.struct.sensor_index(name)]
        return [tuple(rc) for rc in np.asarray(s.image_pos)]

    def get_tactile_flow_images(self):
        field = self.get_tactile_force_vector().reshape(-1, 3)
        images = []
        for s in self.struct.sensors:
            img = np.zeros((s.rows, s.cols, 3))
            ip = np.asarray(s.image_pos)
            img[ip[:, 0], ip[:, 1]] = field[s.marker_start:s.marker_start + s.marker_count]
            images.append(img)
        return images

    # -- backward engine (C7/C8) -------------------------------------------
    def saveBackwardCache(self):
        assert self._episode is not None, "reset(backward_flag=True) first"
        self._cache.append(self._episode)

    def popBackwardCache(self):
        self._episode = self._cache.pop()

    def clearBackwardCache(self):
        self._cache = []

    def backward(self):
        ep = self._episode
        assert ep is not None
        self._run_backward(ep, ep.q0, ep.qdot0, np.stack(ep.us),
                           ep.state_snapshots[0])

    def backward_steps(self, num_steps: int):
        ep = self._episode
        assert ep is not None and len(ep.us) >= num_steps
        us = np.stack(ep.us[-num_steps:])
        snap = ep.state_snapshots[-num_steps]
        self._run_backward(ep, np.asarray(snap.q), np.asarray(snap.qdot), us, snap)

    def _run_backward(self, ep, q0, qdot0, us, state0: SimState):
        T = us.shape[0]
        struct = self.struct
        bi = self.backward_info
        rollout = self.sim.make_rollout_dense(remat=True)
        dtype = self._state.q.dtype

        def fn(q0_, qdot0_, us_, model):
            s0 = state0.replace(q=q0_, qdot=qdot0_)
            _, qs, vars_, tacs = rollout(model, s0, us_)
            return qs, vars_, tacs

        df_dq = np.zeros(T * struct.ndof_q) if bi.df_dq is None else np.asarray(bi.df_dq)
        df_dvar = (np.zeros(T * struct.ndof_var) if bi.df_dvar is None
                   else np.asarray(bi.df_dvar))
        df_dtac = (np.zeros(T * struct.ndof_tactile) if bi.df_dtactile is None
                   else np.asarray(bi.df_dtactile))
        cot = (jnp.asarray(df_dq.reshape(T, -1), dtype),
               jnp.asarray(df_dvar.reshape(T, -1), dtype),
               jnp.asarray(df_dtac.reshape(T, -1), dtype))
        _, vjp_fn = jax.vjp(fn, jnp.asarray(q0, dtype), jnp.asarray(qdot0, dtype),
                            jnp.asarray(us, dtype), self.model)
        gq0, gqdot0, gus, gmodel = vjp_fn(cot)
        r = self.backward_results
        r.df_dq0 = np.asarray(gq0)
        r.df_dqdot0 = np.asarray(gqdot0)
        r.df_du = np.asarray(gus).reshape(-1)
        r.df_dp = gmodel if bi.flag_p else None

    def _test_derivatives(self, eps: float = 1e-6):
        """Built-in FD self-check of d(next q)/du (the reference's
        ``test_derivatives`` flag, C3)."""
        state0 = self._episode.state_snapshots[-1] if self._episode else self._state
        u = jnp.asarray(self._u, state0.q.dtype)

        def qnext(uu):
            return self.sim.step(self.model, state0, uu).q

        J = jax.jacrev(qnext)(u)
        for k in range(min(len(u), 3)):
            du = np.zeros(len(u))
            du[k] = eps
            fd = (qnext(u + du) - qnext(u - du)) / (2 * eps)
            err = np.abs(np.asarray(fd) - np.asarray(J[:, k])).max()
            assert err < 1e-4 * max(1.0, np.abs(np.asarray(J[:, k])).max()), (
                f"derivative self-check failed for u[{k}]: {err}")

    # -- runtime model editing (C9) ----------------------------------------
    def update_body_density(self, name: str, density: float):
        bi = self.struct.body_index(name)
        self.model = builder.update_body_density(
            self.struct.body_gtype[bi], self.model, bi, density)
        self._resync()

    def update_body_color(self, name: str, rgb):
        bi = self.struct.body_index(name)
        rgba = jnp.asarray(list(rgb) + [1.0], self.model.body_rgba.dtype)
        self.model = self.model.replace(
            body_rgba=self.model.body_rgba.at[bi].set(rgba))

    def update_body_size(self, name: str, size):
        """Cylinder: [length, radius] (dclaw_rotate_env.py:175 passes
        [0.03, radius] for the 0.03-long cap); cuboid: full extents; sphere:
        [radius]."""
        bi = self.struct.body_index(name)
        size = np.asarray(size, dtype=np.float64)
        from ..model.schema import GEOM_CYLINDER, GEOM_SPHERE
        if self.struct.body_gtype[bi] == GEOM_CYLINDER:
            new = jnp.asarray([size[1], size[0] / 2.0, 0.0],
                              self.model.body_size.dtype)
        elif self.struct.body_gtype[bi] == GEOM_SPHERE:
            new = jnp.asarray([size[0], 0.0, 0.0], self.model.body_size.dtype)
        else:
            new = jnp.asarray(size, self.model.body_size.dtype)
        self.model = self.model.replace(
            body_size=self.model.body_size.at[bi].set(new))
        self._resync()

    def update_joint_damping(self, name: str, damping: float):
        ji = self.struct.joint_index(name)
        off = self.struct.joint_dof_offset[ji]
        nd = self.struct.joint_ndof[ji]
        dd = self.model.dof_damping
        for d in range(nd):
            dd = dd.at[off + d].set(damping)
        self.model = self.model.replace(dof_damping=dd)
        self._resync()

    def update_joint_location(self, name: str, pos):
        ji = self.struct.joint_index(name)
        self.model = self.model.replace(
            joint_pos=self.model.joint_pos.at[ji].set(
                jnp.asarray(pos, self.model.joint_pos.dtype)))
        self._resync()

    def update_endeffector_position(self, name: str, pos):
        idx = self.struct.ee_names.index(name)
        self.model = self.model.replace(
            ee_pos=self.model.ee_pos.at[idx].set(
                jnp.asarray(pos, self.model.ee_pos.dtype)))
        self._resync()

    def update_contact_parameters(self, body1: str, body2: str, kn=None,
                                  kt=None, mu=None, damping=None):
        b1 = self.struct.body_index(body1)
        b2 = self.struct.body_index(body2)
        m = self.model
        for pair in self.struct.pairs:
            if {pair.general_body, pair.primitive_body} == {b1, b2}:
                k = pair.param_index
                if kn is not None:
                    m = m.replace(pair_kn=m.pair_kn.at[k].set(kn))
                if kt is not None:
                    m = m.replace(pair_kt=m.pair_kt.at[k].set(kt))
                if mu is not None:
                    m = m.replace(pair_mu=m.pair_mu.at[k].set(mu))
                if damping is not None:
                    m = m.replace(pair_damping=m.pair_damping.at[k].set(damping))
        self.model = m
        self._resync()

    def update_tactile_parameters(self, name: str, kn=None, kt=None, mu=None,
                                  damping=None):
        s = self.struct.sensor_index(name)
        m = self.model
        if kn is not None:
            m = m.replace(tac_kn=m.tac_kn.at[s].set(kn))
        if kt is not None:
            m = m.replace(tac_kt=m.tac_kt.at[s].set(kt))
        if mu is not None:
            m = m.replace(tac_mu=m.tac_mu.at[s].set(mu))
        if damping is not None:
            m = m.replace(tac_damping=m.tac_damping.at[s].set(damping))
        self.model = m
        self._resync()

    def update_virtual_object(self, name: str, pos_quat):
        vi = self.struct.virtual_names.index(name)
        pq = np.asarray(pos_quat)
        self.model = self.model.replace(
            virtual_pos=self.model.virtual_pos.at[vi].set(
                jnp.asarray(pq[:3], self.model.virtual_pos.dtype)),
            virtual_quat=self.model.virtual_quat.at[vi].set(
                jnp.asarray(pq[3:7], self.model.virtual_quat.dtype)))

    def _resync(self):
        self.sim.model = self.model

    # -- replay (C11) -------------------------------------------------------
    def replay(self):
        """Replay the recorded trajectory (reference C11 `sim.replay()`).

        Headless equivalent of the reference OpenGL viewer (reference
        utils/renderer.py:7-30 toggles viewer_options.record/record_folder
        then replays): when ``viewer_options.record`` is set, numbered PNG
        frames are written into ``viewer_options.record_folder`` (or a GIF if
        the folder path ends with .gif); otherwise a single final-frame
        preview ``replay.png`` is written next to the cwd so `replay()` is
        never a silent no-op."""
        from ..utils import renderer
        qs = self.export_trajectory()
        if not len(qs):
            return 0
        vo = self.viewer_options
        if vo.record:
            path = vo.record_folder or "replay_frames"
            return renderer.render_trajectory(
                self.struct, self.model, qs, path, fps=vo.fps,
                speed=vo.speed, loop=vo.loop,
                camera=(vo.camera_pos, vo.camera_lookat))
        import numpy as _np
        import matplotlib.pyplot as plt
        fig = renderer.render_frame(self.struct, self.model, qs[-1])
        fig.canvas.draw()
        self.last_render = _np.asarray(
            fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return 1

    def export_trajectory(self):
        return np.stack(self._trajectory) if self._trajectory else np.zeros((0, self.ndof_r))
