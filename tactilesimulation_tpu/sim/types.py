"""Core pytree types: static ``Structure`` + differentiable ``Model`` + ``SimState``.

The reference keeps all of this inside a mutable C++ ``redmax.Simulation``
object (SURVEY.md §2.3). Here the split is:

- ``Structure``: static compile-time facts (topology, dof offsets, point-set
  slices, names). Plain Python object, closed over by the jitted functions a
  ``Simulator`` builds — never traced.
- ``Model``: every numeric quantity that is differentiable or runtime-
  randomizable (the reference's ``update_*`` API, C9) as jnp leaves. Batching a
  ``Model`` under ``vmap`` gives per-episode heterogeneous physics — something
  the reference's single mutable simulation cannot do.
- ``SimState``: the integrator state ``(q, qdot)`` plus one step of history for
  BDF2 and the step counter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Model:
    h: jnp.ndarray                    # () timestep
    gravity: jnp.ndarray              # (3,)
    # joints
    joint_pos: jnp.ndarray            # (J, 3) frame origin in parent joint frame
    joint_quat: jnp.ndarray           # (J, 4)
    joint_axis0: jnp.ndarray          # (J, 3)
    joint_axis1: jnp.ndarray          # (J, 3)
    # per-dof quantities
    dof_damping: jnp.ndarray          # (ndof,)
    dof_lim_lower: jnp.ndarray        # (ndof,)
    dof_lim_upper: jnp.ndarray        # (ndof,)
    dof_lim_stiffness: jnp.ndarray    # (ndof,)
    q_init: jnp.ndarray               # (ndof,)
    qdot_init: jnp.ndarray            # (ndof,)
    # bodies
    body_pos: jnp.ndarray             # (B, 3) body frame in joint frame
    body_quat: jnp.ndarray            # (B, 4)
    body_mass: jnp.ndarray            # (B,)
    body_inertia: jnp.ndarray         # (B, 3) diag, body frame, about COM
    body_size: jnp.ndarray            # (B, 3) SDF geometry params
    body_rgba: jnp.ndarray            # (B, 4) rendering only
    # motors (per actuated dof)
    motor_kp: jnp.ndarray             # (ndof_u,)
    motor_kd: jnp.ndarray             # (ndof_u,)
    motor_ctrl_lo: jnp.ndarray        # (ndof_u,)
    motor_ctrl_hi: jnp.ndarray        # (ndof_u,)
    motor_pos_mask: jnp.ndarray       # (ndof_u,) 1.0 = PD position control
    # contact machinery
    cp_pos: jnp.ndarray               # (Ncp, 3) points in owning JOINT frame
    pair_kn: jnp.ndarray              # (K,)
    pair_kt: jnp.ndarray
    pair_mu: jnp.ndarray
    pair_damping: jnp.ndarray
    ground_pos: jnp.ndarray           # (3,)
    ground_normal: jnp.ndarray        # (3,)
    # tactile sensors
    tac_pos: jnp.ndarray              # (Mtot, 3) markers in owning JOINT frame
    tac_normal: jnp.ndarray           # (Mtot, 3)
    tac_axis0: jnp.ndarray
    tac_axis1: jnp.ndarray
    tac_kn: jnp.ndarray               # (S,)
    tac_kt: jnp.ndarray
    tac_mu: jnp.ndarray
    tac_damping: jnp.ndarray
    # variables / virtual objects
    ee_pos: jnp.ndarray               # (NE, 3) in joint frame
    virtual_pos: jnp.ndarray          # (NV, 3) render-only goal markers
    virtual_quat: jnp.ndarray         # (NV, 4)


@struct.dataclass
class SimState:
    q: jnp.ndarray
    qdot: jnp.ndarray
    q_prev: jnp.ndarray               # previous-step q (BDF2 history)
    qdot_prev: jnp.ndarray
    t: jnp.ndarray                    # () int32 step counter


@dataclasses.dataclass(frozen=True)
class PairInfo:
    general_body: int
    primitive_body: int               # -1 = ground half-space
    point_start: int                  # slice into cp_pos (or tac_pos)
    point_count: int
    general_is_sphere: bool           # analytic sphere-center contact
    param_index: int                  # row in pair_* (or tac_* for tactile)
    sensor_index: int = -1            # >= 0 for tactile pairs


@dataclasses.dataclass(frozen=True)
class SensorInfo:
    name: str
    body: int
    marker_start: int
    marker_count: int
    rows: int
    cols: int
    image_pos: Any                    # (M, 2) numpy int array


@dataclasses.dataclass(frozen=True)
class Structure:
    name: str
    integrator: str                   # "BDF1" | "BDF2"
    njoints: int
    nbodies: int
    ndof_q: int
    ndof_u: int
    ndof_var: int
    ndof_tactile: int
    joint_types: Tuple[int, ...]
    joint_parents: Tuple[int, ...]
    joint_dof_offset: Tuple[int, ...]
    joint_ndof: Tuple[int, ...]
    joint_names: Tuple[str, ...]
    body_joint: Tuple[int, ...]
    body_gtype: Tuple[int, ...]
    body_names: Tuple[str, ...]
    motor_dof: Tuple[int, ...]        # u index -> q dof index
    # vectorized-FK compile-time tables (host numpy; see kinematics.py):
    # trans_dof_idx/rot_dof_idx (J,3) into q padded with a zero slot,
    # trans_basis (J,3,3), rot masks (J,1), depth levels
    fk_tables: Any
    cp_joint: Tuple[int, ...]         # per contact point: owning joint
    pairs: Tuple[PairInfo, ...]
    tac_joint: Tuple[int, ...]        # per marker: owning joint
    tactile_pairs: Tuple[PairInfo, ...]
    contact_groups: Tuple[Any, ...]   # flattened instance groups (contact.py)
    sensors: Tuple[SensorInfo, ...]
    ee_joint: Tuple[int, ...]
    ee_names: Tuple[str, ...]
    virtual_names: Tuple[str, ...]
    has_ground: bool
    solver_tol: float
    solver_max_iter: int
    solver_max_ls: int

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)

    def joint_index(self, name: str) -> int:
        return self.joint_names.index(name)

    def sensor_index(self, name: str) -> int:
        for i, s in enumerate(self.sensors):
            if s.name == name:
                return i
        raise KeyError(name)
