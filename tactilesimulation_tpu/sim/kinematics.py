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


def fk_joints(struct: Structure, model: Model, q):
    """World pose of every joint frame: (p (J,3), quat (J,4))."""
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
