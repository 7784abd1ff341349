"""Reduced-coordinate forward kinematics (pure jnp, static topology unroll).

Joint semantics reconstructed from the reference scene schema (SURVEY.md §2.4):
child joint frames are specified relative to the *parent joint* frame
(validated: stable_grasp tactile pad offset (0.004, 0, 0.1472) under the
pi-flipped gripper_left_joint lands the pad at the bar height 0.0525 when the
base is at z = 0.2), and free joints order dofs translation-then-rotation
(test_sim_speed.py:54, stable_grasp_env.py:236-243).

The joint loop is a static Python unroll — njoints <= ~21 across all reference
scenes, so XLA sees a small flat graph; there is no data-dependent control
flow anywhere (jit/vmap/grad-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import spatial
from .types import Model, Structure
from ..model.schema import (
    JOINT_FIXED,
    JOINT_FREE3D_EULER,
    JOINT_FREE3D_EXP,
    JOINT_PLANAR,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    JOINT_TRANSLATIONAL,
)


def build_fk_tables(joint_types, joint_parents, joint_dof_offset, axis0, axis1):
    """Host-side compile of the vectorized-FK tables (called by the builder).

    The per-joint-type Python branches of the naive FK produce long scalar op
    chains that blow up XLA compile times under nested AD; these tables turn
    the local variable transforms into a handful of (J, ...) batched ops:

    - trans_dof_idx (J,3): q indices (padded-zero slot = ndof) whose gathered
      values, contracted with trans_basis (J,3,3), give the local translation
      for every joint type at once,
    - rot_dof_idx (J,3) + masks: the rotation dofs feeding axis-angle /
      exp-map / euler quaternion formulas, mask-selected per joint,
    - levels: topological depth levels (joints at equal depth compose from
      their parents in one batched transform).
    """
    import numpy as np
    from ..model.schema import (JOINT_FIXED, JOINT_FREE3D_EULER,
                                JOINT_FREE3D_EXP, JOINT_PLANAR,
                                JOINT_PRISMATIC, JOINT_REVOLUTE,
                                JOINT_TRANSLATIONAL)

    J = len(joint_types)
    ndof = 0
    for j in range(J):
        from ..model.schema import JOINT_NDOF
        ndof = max(ndof, joint_dof_offset[j]
                   + JOINT_NDOF[joint_types[j]])
    pad = ndof  # index of the zero slot in q_pad

    trans_idx = np.full((J, 3), pad, dtype=np.int32)
    rot_idx = np.full((J, 3), pad, dtype=np.int32)
    basis = np.zeros((J, 3, 3))
    m_rev = np.zeros((J, 1))
    m_exp = np.zeros((J, 1))
    m_eul = np.zeros((J, 1))
    eye = np.eye(3)
    for j in range(J):
        t, off = joint_types[j], joint_dof_offset[j]
        if t == JOINT_PRISMATIC:
            trans_idx[j, 0] = off
            basis[j, :, 0] = axis0[j]
        elif t == JOINT_PLANAR:
            trans_idx[j, 0:2] = [off, off + 1]
            basis[j, :, 0] = axis0[j]
            basis[j, :, 1] = axis1[j]
        elif t in (JOINT_TRANSLATIONAL, JOINT_FREE3D_EXP, JOINT_FREE3D_EULER):
            trans_idx[j] = [off, off + 1, off + 2]
            basis[j] = eye
        if t == JOINT_REVOLUTE:
            rot_idx[j, 0] = off
            m_rev[j] = 1.0
        elif t == JOINT_FREE3D_EXP:
            rot_idx[j] = [off + 3, off + 4, off + 5]
            m_exp[j] = 1.0
        elif t == JOINT_FREE3D_EULER:
            rot_idx[j] = [off + 3, off + 4, off + 5]
            m_eul[j] = 1.0

    # depth levels
    depth = [0] * J
    for j in range(J):
        depth[j] = 0 if joint_parents[j] < 0 else depth[joint_parents[j]] + 1
    levels = []
    for d in range(max(depth) + 1 if J else 0):
        idx = np.asarray([j for j in range(J) if depth[j] == d],
                         dtype=np.int32)
        par = np.asarray([max(joint_parents[j], 0) for j in idx],
                         dtype=np.int32)
        is_root = d == 0
        levels.append((idx, par, is_root))
    return {"trans_idx": trans_idx, "rot_idx": rot_idx, "basis": basis,
            "m_rev": m_rev, "m_exp": m_exp, "m_eul": m_eul,
            "levels": tuple(levels)}


def _joint_variable_transform(struct: Structure, model: Model, q, j):
    """Local variable transform Q(q_j) of joint j: (pos (3,), quat (4,))."""
    jt = struct.joint_types[j]
    off = struct.joint_dof_offset[j]
    dtype = q.dtype
    zero3 = jnp.zeros(3, dtype)
    ident = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
    if jt == JOINT_FIXED:
        return zero3, ident
    if jt == JOINT_REVOLUTE:
        return zero3, spatial.axis_angle_quat(model.joint_axis0[j], q[off])
    if jt == JOINT_PRISMATIC:
        return model.joint_axis0[j] * q[off], ident
    if jt == JOINT_PLANAR:
        return (model.joint_axis0[j] * q[off] + model.joint_axis1[j] * q[off + 1],
                ident)
    if jt == JOINT_TRANSLATIONAL:
        return q[off:off + 3], ident
    if jt == JOINT_FREE3D_EXP:
        return q[off:off + 3], spatial.rotvec_to_quat(q[off + 3:off + 6])
    if jt == JOINT_FREE3D_EULER:
        return q[off:off + 3], spatial.euler_xyz_to_quat(q[off + 3:off + 6])
    raise ValueError(jt)


def fk_joints_reference(struct: Structure, model: Model, q):
    """Naive per-joint unrolled FK — oracle for testing the vectorized path."""
    ps, qs = [], []
    for j in range(struct.njoints):
        par = struct.joint_parents[j]
        if par < 0:
            pp = jnp.zeros(3, q.dtype)
            pq = jnp.array([1.0, 0.0, 0.0, 0.0], q.dtype)
        else:
            pp, pq = ps[par], qs[par]
        # fixed frame offset then variable transform
        fp, fq = spatial.transform_compose(pp, pq, model.joint_pos[j], model.joint_quat[j])
        vp, vq = _joint_variable_transform(struct, model, q, j)
        wp, wq = spatial.transform_compose(fp, fq, vp, vq)
        ps.append(wp)
        qs.append(wq)
    return jnp.stack(ps), jnp.stack(qs)


def fk_joints(struct: Structure, model: Model, q):
    """World pose of every joint frame: (p (J,3), quat (J,4)).

    Vectorized: batched local transforms over all joints + depth-level chain
    composition (see build_fk_tables). Joints at the same tree depth compose
    from their parents in one batched quaternion op, so the graph scales with
    tree DEPTH (<= 8 in the reference scenes), not joint count."""
    tb = struct.fk_tables
    dtype = q.dtype
    q_pad = jnp.concatenate([q, jnp.zeros(1, dtype)])
    qt = jnp.take(q_pad, jnp.asarray(tb["trans_idx"]))            # (J,3)
    trans_local = jnp.einsum("jik,jk->ji", jnp.asarray(tb["basis"], dtype), qt,
                            precision=jax.lax.Precision.HIGHEST)
    qr = jnp.take(q_pad, jnp.asarray(tb["rot_idx"]))              # (J,3)
    aa = spatial.axis_angle_quat(model.joint_axis0, qr[:, 0])
    expq = spatial.rotvec_to_quat(qr)
    eulq = spatial.euler_xyz_to_quat(qr)
    m_rev = jnp.asarray(tb["m_rev"], dtype)
    m_exp = jnp.asarray(tb["m_exp"], dtype)
    m_eul = jnp.asarray(tb["m_eul"], dtype)
    m_id = 1.0 - m_rev - m_exp - m_eul
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype)
    quat_local = (m_rev * aa + m_exp * expq + m_eul * eulq
                  + m_id * ident[None, :])
    # frame offset then variable transform (batched)
    p_loc = model.joint_pos + spatial.quat_rotate(model.joint_quat, trans_local)
    q_loc = spatial.quat_mul(model.joint_quat, quat_local)

    J = struct.njoints
    wp = jnp.zeros((J, 3), dtype)
    wq = jnp.tile(ident, (J, 1))
    for idx_np, par_np, is_root in tb["levels"]:
        idx = jnp.asarray(idx_np)
        if is_root:
            wp = wp.at[idx].set(p_loc[idx_np])
            wq = wq.at[idx].set(q_loc[idx_np])
        else:
            par = jnp.asarray(par_np)
            bp = jnp.take(wp, par, axis=0)
            bq = jnp.take(wq, par, axis=0)
            wp = wp.at[idx].set(bp + spatial.quat_rotate(bq, p_loc[idx_np]))
            wq = wq.at[idx].set(spatial.quat_mul(bq, q_loc[idx_np]))
    return wp, wq


def fk_bodies(struct: Structure, model: Model, q):
    """World pose of every body (COM) frame: (p (B,3), quat (B,4))."""
    jp, jq = fk_joints(struct, model, q)
    bj = jnp.asarray(struct.body_joint)
    pj = jnp.take(jp, bj, axis=0)
    qj = jnp.take(jq, bj, axis=0)
    return spatial.transform_compose(pj, qj, model.body_pos, model.body_quat)


def body_frames(struct: Structure, model: Model, q):
    """(p (B,3), R (B,3,3)) — the FK output everything else derives from."""
    p, quat = fk_bodies(struct, model, q)
    return p, spatial.quat_to_mat(quat)


def points_world(struct: Structure, model: Model, q, points, joint_index):
    """Transform joint-frame point sets to world. ``joint_index``: static tuple
    (one owning joint per point)."""
    if len(joint_index) == 0:
        return jnp.zeros((0, 3), q.dtype)
    jp, jq = fk_joints(struct, model, q)
    idx = jnp.asarray(joint_index)
    return spatial.transform_apply(
        jnp.take(jp, idx, axis=0), jnp.take(jq, idx, axis=0), points)


def contact_points_world(struct: Structure, model: Model, q):
    return points_world(struct, model, q, model.cp_pos, struct.cp_joint)


def tactile_points_world(struct: Structure, model: Model, q):
    return points_world(struct, model, q, model.tac_pos, struct.tac_joint)


def tactile_frames_world(struct: Structure, model: Model, q):
    """Rotate per-marker sensor axes to world: (normal, axis0, axis1) (M,3)."""
    if len(struct.tac_joint) == 0:
        z = jnp.zeros((0, 3), q.dtype)
        return z, z, z
    _, jq = fk_joints(struct, model, q)
    qw = jnp.take(jq, jnp.asarray(struct.tac_joint), axis=0)
    return (spatial.quat_rotate(qw, model.tac_normal),
            spatial.quat_rotate(qw, model.tac_axis0),
            spatial.quat_rotate(qw, model.tac_axis1))


def fk_all(struct: Structure, model: Model, q):
    """One-pass FK for the contact pipeline: body poses + the combined
    [contact points; tactile markers] world array (joint transforms computed
    once and shared)."""
    jp, jq = fk_joints(struct, model, q)
    bj = jnp.asarray(struct.body_joint)
    bp, bquat = spatial.transform_compose(
        jnp.take(jp, bj, axis=0), jnp.take(jq, bj, axis=0),
        model.body_pos, model.body_quat)
    pts = []
    for arr, jidx in ((model.cp_pos, struct.cp_joint),
                      (model.tac_pos, struct.tac_joint)):
        if len(jidx) == 0:
            pts.append(jnp.zeros((0, 3), q.dtype))
        else:
            idx = jnp.asarray(jidx)
            pts.append(spatial.transform_apply(
                jnp.take(jp, idx, axis=0), jnp.take(jq, idx, axis=0), arr))
    return bp, bquat, jnp.concatenate(pts, axis=0)


def ee_positions(struct: Structure, model: Model, q):
    """Stacked world positions of the <variable><endeffector> markers —
    the reference ``get_variables()`` (C10, dclaw_rotate_env.py:97-98)."""
    if len(struct.ee_joint) == 0:
        return jnp.zeros((0,), q.dtype)
    return points_world(struct, model, q, model.ee_pos, struct.ee_joint).reshape(-1)
