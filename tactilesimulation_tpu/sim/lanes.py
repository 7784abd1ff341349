"""Lane-major (batch-last) physics core — the TPU-native batched hot path.

Why this exists: the single-instance core (spatial/kinematics/dynamics/
integrators) keeps coordinate components in the minor axis, so under
``vmap`` every intermediate is ``(B, 3)`` / ``(B, 7)`` shaped and each XLA op
occupies 3-7 of the 128 VPU lanes (~95% of every tile wasted, and the graph
is HBM-bandwidth-bound on the padding — measured on TPU v5e: env.step time
scales LINEARLY in B, one batched residual eval = 3.6 ms at B=1024).

This module re-expresses the same math with the batch in the LAST axis:
quaternions are ``(4, ..., B)``, vectors ``(3, ..., B)``, generalized
coordinates ``(n, B)``. Every elementwise op then runs at full lane
utilization and intermediates shrink ~18x. The dense per-lane linear solves
use an unrolled no-pivot Gaussian elimination over ``(n, n, B)`` stacks
(n <= 12 across all reference scenes; the iteration matrix is a perturbed
SPD mass matrix, so pivoting is unnecessary — a scaled Tikhonov ridge guards
near-singular lanes, mirroring integrators._newton).

Semantics match the single-instance core exactly (same momentum-form
residual, same chord iteration, same IFT custom VJP); tests pin lane-major
rollouts against ``vmap`` of the reference path to float64 round-off.

Reference parity: this replaces the batched use of SURVEY.md C2/C3/C5/C7 —
the reference cannot batch at all (one mutable C++ sim per process).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import contact
from .types import Model, Structure

_EPS = 1e-12


# ---------------------------------------------------------------------------
# component-first quaternion / SO(3) algebra  (axis 0 = component)
# ---------------------------------------------------------------------------

def cross(a, b):
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])


def quat_mul(a, b):
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack([aw * bw - ax * bx - ay * by - az * bz,
                      aw * bx + ax * bw + ay * bz - az * by,
                      aw * by - ax * bz + ay * bw + az * bx,
                      aw * bz + ax * by - ay * bx + az * bw])


def quat_conj(q):
    return jnp.stack([q[0], -q[1], -q[2], -q[3]])


def quat_rotate(q, v):
    qv, w = q[1:], q[0:1]
    t = 2.0 * cross(qv, v)
    return v + w * t + cross(qv, t)


def quat_to_mat(q):
    """(4, ...) -> (3, 3, ...) world-from-local."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)])
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)])
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)])
    return jnp.stack([row0, row1, row2])


def rotvec_to_quat(r):
    angle_sq = jnp.sum(r * r, axis=0, keepdims=True)
    angle = jnp.sqrt(angle_sq + _EPS)
    half = 0.5 * angle
    small = angle_sq < 1e-8
    k = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * r], axis=0)


def euler_xyz_to_quat(e):
    half = 0.5 * e
    cx, cy, cz = jnp.cos(half[0]), jnp.cos(half[1]), jnp.cos(half[2])
    sx, sy, sz = jnp.sin(half[0]), jnp.sin(half[1]), jnp.sin(half[2])
    return jnp.stack([cx * cy * cz - sx * sy * sz,
                      sx * cy * cz + cx * sy * sz,
                      cx * sy * cz - sx * cy * sz,
                      cx * cy * sz + sx * sy * cz])


def axis_angle_quat(axis, angle):
    """axis (3, ...broadcastable), angle (...) -> (4, ...)."""
    half = 0.5 * angle[None]
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=0)


def transform_compose(p_a, q_a, p_b, q_b):
    return p_a + quat_rotate(q_a, p_b), quat_mul(q_a, q_b)


def _col(arr2d, dtype):
    """Host (K, 3/4) row-major table -> (3/4, K, 1) lane-major constant."""
    return jnp.asarray(arr2d, dtype).T[:, :, None]


def mat_vec(R, v):
    """R v, unrolled: R (3, 3, ..., B), v (3, ..., B) -> (3, ..., B).

    An einsum here lowers to a dot_general with a 3-wide contraction — on
    TPU that pads onto 128x128 MXU tiles and forces layout transposes; the
    unrolled form stays on the VPU with the native lane-major layout."""
    return jnp.stack([R[i, 0] * v[0] + R[i, 1] * v[1] + R[i, 2] * v[2]
                      for i in range(3)])


def mat_tvec(R, v):
    """R^T v, unrolled (see mat_vec)."""
    return jnp.stack([R[0, i] * v[0] + R[1, i] * v[1] + R[2, i] * v[2]
                      for i in range(3)])


# ---------------------------------------------------------------------------
# forward kinematics  (q: (n, B))
# ---------------------------------------------------------------------------

def fk_joints(struct: Structure, model: Model, q):
    """World joint frames: (p (3, J, B), quat (4, J, B))."""
    tb = struct.fk_tables
    dtype = q.dtype
    B = q.shape[1]
    q_pad = jnp.concatenate([q, jnp.zeros((1, B), dtype)], axis=0)
    qt = q_pad[jnp.asarray(tb["trans_idx"].T)]                  # (3, J, B)
    basis = jnp.asarray(tb["basis"], dtype)                     # (J, 3, 3)
    bT = basis.transpose(1, 2, 0)                               # (i, k, J)
    trans_local = jnp.stack(
        [sum(bT[i, k][:, None] * qt[k] for k in range(3))
         for i in range(3)])                                    # (3, J, B)
    qr = q_pad[jnp.asarray(tb["rot_idx"].T)]                    # (3, J, B)
    axis0 = _col(model.joint_axis0, dtype)                      # (3, J, 1)
    aa = axis_angle_quat(axis0, qr[0])
    expq = rotvec_to_quat(qr)
    eulq = euler_xyz_to_quat(qr)

    def mask(m):
        return jnp.asarray(m, dtype).reshape(1, -1, 1)          # (1, J, 1)

    m_rev, m_exp, m_eul = mask(tb["m_rev"]), mask(tb["m_exp"]), mask(tb["m_eul"])
    m_id = 1.0 - m_rev - m_exp - m_eul
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype).reshape(4, 1, 1)
    quat_local = m_rev * aa + m_exp * expq + m_eul * eulq + m_id * ident
    jpos = _col(model.joint_pos, dtype)
    jquat = _col(model.joint_quat, dtype)
    p_loc = jpos + quat_rotate(jquat, trans_local)
    q_loc = quat_mul(jquat, quat_local)

    J = struct.njoints
    wp = jnp.zeros((3, J, B), dtype)
    wq = jnp.broadcast_to(ident, (4, J, B))
    for idx_np, par_np, is_root in tb["levels"]:
        if is_root:
            wp = wp.at[:, idx_np].set(jnp.broadcast_to(p_loc[:, idx_np],
                                                       (3, len(idx_np), B)))
            wq = wq.at[:, idx_np].set(jnp.broadcast_to(q_loc[:, idx_np],
                                                       (4, len(idx_np), B)))
        else:
            bp = wp[:, par_np]
            bq = wq[:, par_np]
            wp = wp.at[:, idx_np].set(bp + quat_rotate(bq, p_loc[:, idx_np]))
            wq = wq.at[:, idx_np].set(quat_mul(bq, q_loc[:, idx_np]))
    return wp, wq


def fk_bodies(struct: Structure, model: Model, q):
    jp, jq = fk_joints(struct, model, q)
    bj = np.asarray(struct.body_joint)
    return transform_compose(jp[:, bj], jq[:, bj],
                             _col(model.body_pos, q.dtype),
                             _col(model.body_quat, q.dtype))


def fk_all(struct: Structure, model: Model, q):
    """Body poses + combined [contact points; tactile markers] world array."""
    dtype = q.dtype
    B = q.shape[1]
    jp, jq = fk_joints(struct, model, q)
    bj = np.asarray(struct.body_joint)
    bp, bquat = transform_compose(jp[:, bj], jq[:, bj],
                                  _col(model.body_pos, dtype),
                                  _col(model.body_quat, dtype))
    pts = []
    for arr, jidx in ((model.cp_pos, struct.cp_joint),
                      (model.tac_pos, struct.tac_joint)):
        if len(jidx) == 0:
            pts.append(jnp.zeros((3, 0, B), dtype))
        else:
            idx = np.asarray(jidx)
            pts.append(jp[:, idx]
                       + quat_rotate(jq[:, idx], jnp.asarray(arr, dtype).T[:, :, None]))
    return bp, bquat, jnp.concatenate(pts, axis=1)


def ee_positions(struct: Structure, model: Model, q):
    """(ndof_var, B) stacked end-effector world positions."""
    if len(struct.ee_joint) == 0:
        return jnp.zeros((0, q.shape[1]), q.dtype)
    jp, jq = fk_joints(struct, model, q)
    idx = np.asarray(struct.ee_joint)
    x = jp[:, idx] + quat_rotate(jq[:, idx],
                                 jnp.asarray(model.ee_pos, q.dtype).T[:, :, None])
    # stack as [x0 y0 z0 x1 y1 z1 ...] rows to match kinematics.ee_positions
    return x.transpose(1, 0, 2).reshape(-1, q.shape[1])


# ---------------------------------------------------------------------------
# dynamics  (momentum form, mirrors dynamics.py)
# ---------------------------------------------------------------------------

def lagrangian(struct: Structure, model: Model, q, v):
    """(B,) Lagrangian per lane.

    ``model.body_mass`` / ``body_inertia`` may carry a trailing per-lane
    batch axis ((NB, B) / (NB, 3, B)) — per-episode heterogeneous physics
    (StableGrasp density randomization, SURVEY.md C9) at full lane speed."""
    fk = lambda qq: fk_bodies(struct, model, qq)
    (p, quat), (pd, quatd) = jax.jvp(fk, (q,), (v,))
    w = 2.0 * quat_mul(quatd, quat_conj(quat))[1:]
    R = quat_to_mat(quat)                               # (3, 3, NB, B)
    w_local = mat_tvec(R, w)
    dtype = q.dtype
    bm = jnp.asarray(model.body_mass, dtype)            # (NB,) or (NB, B)
    mass = bm[None, :, None] if bm.ndim == 1 else bm[None]
    bi = jnp.asarray(model.body_inertia, dtype)         # (NB, 3[, B])
    inertia = bi.T[:, :, None] if bi.ndim == 2 else bi.transpose(1, 0, 2)
    T = (0.5 * jnp.sum(mass * pd * pd, axis=(0, 1))
         + 0.5 * jnp.sum(inertia * w_local * w_local, axis=(0, 1)))
    g3 = jnp.asarray(model.gravity, dtype)
    gdotp = g3[0] * p[0] + g3[1] * p[1] + g3[2] * p[2]
    V = -jnp.sum((bm[:, None] if bm.ndim == 1 else bm) * gdotp, axis=0)
    return T - V


def el_terms(struct: Structure, model: Model, q, v):
    """(dL/dq, dL/dv) as (n, B) — lanes are independent, so the gradient of
    the lane-sum is the per-lane gradient."""
    def L_sum(qq, vv):
        return jnp.sum(lagrangian(struct, model, qq, vv))
    return jax.grad(L_sum, argnums=(0, 1))(q, v)


def momentum(struct: Structure, model: Model, q, v):
    def T_sum(vv):
        return jnp.sum(lagrangian(struct, model, q, vv))
    # V does not depend on v, so dL/dv == dT/dv == momentum
    return jax.grad(T_sum)(v)


def joint_spring_forces(model: Model, q, v):
    dtype = q.dtype
    damping = jnp.asarray(model.dof_damping, dtype)[:, None]
    lo = jnp.asarray(model.dof_lim_lower, dtype)[:, None]
    hi = jnp.asarray(model.dof_lim_upper, dtype)[:, None]
    stiff = jnp.asarray(model.dof_lim_stiffness, dtype)[:, None]
    below = jnp.maximum(lo - q, 0.0)
    above = jnp.maximum(q - hi, 0.0)
    return -damping * v + stiff * (below - above)


def motor_forces(struct: Structure, model: Model, q, v, u):
    if struct.ndof_u == 0:
        return jnp.zeros_like(q)
    dtype = q.dtype
    dof = np.asarray(struct.motor_dof)
    lo = jnp.asarray(model.motor_ctrl_lo, dtype)[:, None]
    hi = jnp.asarray(model.motor_ctrl_hi, dtype)[:, None]
    kp = jnp.asarray(model.motor_kp, dtype)[:, None]
    kd = jnp.asarray(model.motor_kd, dtype)[:, None]
    mask = jnp.asarray(model.motor_pos_mask, dtype)[:, None]
    uc = jnp.clip(u, lo, hi)
    pd = kp * (uc - q[dof]) - kd * v[dof]
    tau = mask * pd + (1.0 - mask) * uc
    return jnp.zeros_like(q).at[dof].add(tau)


# -- contact ---------------------------------------------------------------

def _sdf_box(xl, half):
    """xl (3, N, B), half (3, N, 1)."""
    d = jnp.abs(xl) - half
    dmax = jnp.max(d, axis=0, keepdims=True)
    outside = jnp.maximum(d, 0.0)
    out_norm = jnp.sqrt(jnp.sum(outside**2, axis=0, keepdims=True)
                        + contact._EPS**2)
    phi = jnp.where(dmax[0] > 0, out_norm[0], dmax[0])
    g_out = outside / out_norm * jnp.sign(xl)
    inside_axis = (d == dmax).astype(xl.dtype)
    inside_axis = inside_axis / jnp.sum(inside_axis, axis=0, keepdims=True)
    g_in = inside_axis * jnp.sign(xl)
    g = jnp.where(dmax > 0, g_out, g_in)
    return phi, g


def _sdf_cylinder(xl, radius, half_len):
    r2 = jnp.sqrt(xl[0] ** 2 + xl[1] ** 2 + contact._EPS**2)
    dr = r2 - radius
    dz = jnp.abs(xl[2]) - half_len
    dmax = jnp.maximum(dr, dz)
    o_r = jnp.maximum(dr, 0.0)
    o_z = jnp.maximum(dz, 0.0)
    out_norm = jnp.sqrt(o_r**2 + o_z**2 + contact._EPS**2)
    phi = jnp.where(dmax > 0, out_norm, dmax)
    pick_r = (dr >= dz).astype(xl.dtype)
    c_r = jnp.where(dmax > 0, o_r / out_norm, pick_r)
    c_z = jnp.where(dmax > 0, o_z / out_norm, 1.0 - pick_r)
    return phi, jnp.stack([c_r * xl[0] / r2, c_r * xl[1] / r2,
                           c_z * jnp.sign(xl[2])])


def _sdf_sphere(xl, radius):
    r = jnp.sqrt(jnp.sum(xl**2, axis=0) + contact._EPS**2)
    return r - radius, xl / r[None]


def _group_sdf(group, struct, model, x, body_p, body_R):
    """x (3, N, B) -> (phi (N, B), n (3, N, B))."""
    dtype = x.dtype
    if group.gtype == contact.GROUND:
        n = jnp.asarray(model.ground_normal, dtype).reshape(3, 1, 1)
        gp = jnp.asarray(model.ground_pos, dtype).reshape(3, 1, 1)
        phi = jnp.sum((x - gp) * n, axis=0)
        return phi, jnp.broadcast_to(n, x.shape)
    pidx = np.asarray(group.prim_body)
    p_b = body_p[:, pidx]
    R_b = body_R[:, :, pidx]                           # (3, 3, N, B)
    size = _col(model.body_size, dtype)[:, pidx]       # (3, N, 1)
    d = x - p_b
    xl = mat_tvec(R_b, d)                              # R^T d
    if group.gtype == contact.GEOM_CUBOID:
        phi, gl = _sdf_box(xl, size / 2.0)
    elif group.gtype == contact.GEOM_CYLINDER:
        phi, gl = _sdf_cylinder(xl, size[0], size[1])
    elif group.gtype == contact.GEOM_SPHERE:
        phi, gl = _sdf_sphere(xl, size[0])
    else:
        raise ValueError(group.gtype)
    n = mat_vec(R_b, gl)
    return phi, n


def _select_params(params, param_idx):
    """Rows of the combined contact-param table for one group:
    (K, 4) -> (4, N, 1); per-lane batched (K, 4, B) -> (4, N, B)."""
    sel = params[np.asarray(param_idx)]
    if sel.ndim == 2:
        return sel.T[:, :, None]
    return jnp.swapaxes(sel, 0, 1)


def _penalty_force(phi, n, v_rel, prm):
    """phi (N, B), n/v_rel (3, N, B), prm (4, N, 1)."""
    kn, kt, mu, damping = prm[0], prm[1], prm[2], prm[3]
    pen = jnp.maximum(-phi, 0.0)
    pdot = jnp.maximum(-jnp.sum(n * v_rel, axis=0), 0.0)
    fn_mag = kn * pen + damping * pen * pdot
    vt = v_rel - jnp.sum(v_rel * n, axis=0, keepdims=True) * n
    vt_norm = jnp.sqrt(jnp.sum(vt**2, axis=0) + contact._EPS**2)
    cap = mu * fn_mag
    scale = cap / jnp.maximum(cap, kt * vt_norm + contact._EPS)
    return fn_mag[None] * n - (kt * scale)[None] * vt


def _rotate_vjp(quat, xi, cot):
    _, pullback = jax.vjp(quat_rotate, quat, xi)
    return pullback(cot)[0]


# ---------------------------------------------------------------------------
# geometric velocity kinematics (analytic dof axes -> joint twists / wrenches)
#
# Why: PROFILE_r03.json showed the AD formulation of contact (jax.linearize
# of FK for point velocities + jax.linear_transpose for J^T f) dominates the
# substep (5.6 ms of 8.25 ms at B=1024, HBM-traffic-bound: the n-wide vmapped
# tangent multiplies every (3, N, B) intermediate by n). Every joint type
# reduces to per-dof world axes: translational dofs contribute w_k, rotational
# dofs w_k x (x - c_k); summing per OWNING JOINT gives classic twists
# (Omega_j, beta_j) and transposes to per-joint wrenches (F_j, tau_j) — so
# point velocities and generalized contact forces need only (3, N, B) arrays
# plus (·, J, B) reductions. Exact (not an approximation): pinned against the
# AD formulation to round-off in tests/test_lanes.py.
# ---------------------------------------------------------------------------

def _dof_tables(struct: Structure):
    """Static per-dof host tables: owning joint, ancestor masks."""
    J, n = struct.njoints, struct.ndof_q
    anc = np.zeros((J, J), bool)              # anc[a, j]: a ancestor-of/self j
    for j in range(J):
        a = j
        while a >= 0:
            anc[a, j] = True
            a = struct.joint_parents[a]
    tb = struct.fk_tables
    dof_joint = np.full(n, -1, np.int64)
    for j in range(J):
        for i in range(3):
            for d in (int(tb["trans_idx"][j, i]), int(tb["rot_idx"][j, i])):
                if d != n:
                    dof_joint[d] = j
    anc_dof = anc[dof_joint]                  # (n, J)
    return anc_dof


def _jl_cols(r):
    """Columns of the SO(3) left Jacobian at rotvec r (3, B) -> (3, 3, B):
    col i = e_i + a (r x e_i) + b (r x (r x e_i)), the exact world-frame
    rotation generator axes of exp-map dofs (R(r+d) ~ exp([Jl d]x) R(r))."""
    th2 = jnp.sum(r * r, axis=0)
    th = jnp.sqrt(th2 + _EPS)
    small = th2 < 1e-8
    safe2 = jnp.where(small, 1.0, th2)
    a = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / safe2)
    b = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / (safe2 * th))
    cols = []
    for i in range(3):
        e = jnp.zeros((3, 1), r.dtype).at[i, 0].set(1.0)
        e = jnp.broadcast_to(e, r.shape)
        rxe = cross(r, e)
        cols.append(e + a * rxe + b * cross(r, rxe))
    return jnp.stack(cols)                     # (col, 3, B)


def dof_frames(struct: Structure, model: Model, q, jp, jq):
    """Per-dof world rotation/translation axes.

    Returns (w (3, n, B) axis, c (3, n, B) rotation origin — zeros for
    translational dofs, rot_mask (n,) static numpy). jp/jq are fk_joints
    outputs. Exact for all 7 joint types (revolute/prismatic/planar/
    translational/fixed/free3d-exp/free3d-euler)."""
    from ..model.schema import (JOINT_FREE3D_EULER, JOINT_FREE3D_EXP,
                                JOINT_REVOLUTE)
    tb = struct.fk_tables
    dtype = q.dtype
    B = q.shape[1]
    n = struct.ndof_q
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype).reshape(4, 1)
    jquat = _col(model.joint_quat, dtype)                    # (4, J, 1)
    q_pad = jnp.concatenate([q, jnp.zeros((1, B), dtype)], axis=0)
    zeros3 = jnp.zeros((3, B), dtype)
    ws = [zeros3] * n
    cs = [zeros3] * n
    rot_mask = np.zeros(n)
    for j in range(struct.njoints):
        par = struct.joint_parents[j]
        pq = jq[:, par] if par >= 0 else jnp.broadcast_to(ident, (4, B))
        Fq = quat_mul(pq, jnp.broadcast_to(jquat[:, j], (4, B)))
        for i in range(3):                     # translational dofs
            d = int(tb["trans_idx"][j, i])
            if d == n:
                continue
            bcol = jnp.asarray(np.asarray(tb["basis"])[j][:, i],
                               dtype).reshape(3, 1)
            ws[d] = quat_rotate(Fq, jnp.broadcast_to(bcol, (3, B)))
        jt = struct.joint_types[j]
        origin = jp[:, j]
        if jt == JOINT_REVOLUTE:
            d = int(tb["rot_idx"][j, 0])
            ax = jnp.asarray(model.joint_axis0, dtype)[j].reshape(3, 1)
            ws[d] = quat_rotate(Fq, jnp.broadcast_to(ax, (3, B)))
            cs[d] = origin
            rot_mask[d] = 1.0
        elif jt == JOINT_FREE3D_EXP:
            ridx = np.asarray(tb["rot_idx"][j])
            r = q_pad[ridx]                    # (3, B)
            cols = _jl_cols(r)                 # (col, 3, B)
            for i in range(3):
                d = int(ridx[i])
                ws[d] = quat_rotate(Fq, cols[i])
                cs[d] = origin
                rot_mask[d] = 1.0
        elif jt == JOINT_FREE3D_EULER:
            ridx = np.asarray(tb["rot_idx"][j])
            ex, ey = q_pad[int(ridx[0])], q_pad[int(ridx[1])]
            cx, sx = jnp.cos(ex), jnp.sin(ex)
            cy, sy = jnp.cos(ey), jnp.sin(ey)
            zero = jnp.zeros_like(ex)
            one = jnp.ones_like(ex)
            # R = Rx(ex) Ry(ey) Rz(ez): generator axes x, Rx y, Rx Ry z
            locals_ = (jnp.stack([one, zero, zero]),
                       jnp.stack([zero, cx, sx]),
                       jnp.stack([sy, -sx * cy, cx * cy]))
            for i in range(3):
                d = int(ridx[i])
                ws[d] = quat_rotate(Fq, locals_[i])
                cs[d] = origin
                rot_mask[d] = 1.0
    return jnp.stack(ws, axis=1), jnp.stack(cs, axis=1), rot_mask


def joint_twists(struct: Structure, w, c, rot_mask, v):
    """World twist of every joint frame: (Omega (3, J, B), beta (3, J, B))
    with point velocity on joint j's subtree = Omega_j x X + beta_j."""
    anc = jnp.asarray(_dof_tables(struct), w.dtype)          # (n, J)
    rm = jnp.asarray(rot_mask, w.dtype).reshape(1, -1, 1)
    wv = w * v[None]                                          # (3, n, B)
    u = cross(w, c)                                           # w_k x c_k
    omega_terms = rm * wv
    beta_terms = (1.0 - rm) * wv - rm * (u * v[None])
    # precision=HIGHEST: these dot_generals hit the MXU, whose default
    # f32 path multiplies in bfloat16 — enough twist error to bifurcate
    # stiff contact trajectories on TPU (found via rolling-ball r04 A/B:
    # CPU f32 matched the oracle to 9e-8, TPU diverged to nonsense)
    hi = jax.lax.Precision.HIGHEST
    Omega = jnp.einsum("cnb,nj->cjb", omega_terms, anc, precision=hi)
    beta = jnp.einsum("cnb,nj->cjb", beta_terms, anc, precision=hi)
    return Omega, beta


def wrench_to_Q(struct: Structure, w, c, rot_mask, F, Tau):
    """Generalized forces from per-joint world wrenches (force sum F (3,J,B),
    torque-about-world-origin sum Tau (3,J,B)):
    Q_k = sum_j anc[k,j] * (rot: w_k . Tau_j - (w_k x c_k) . F_j,
                            trans: w_k . F_j)."""
    anc = jnp.asarray(_dof_tables(struct), w.dtype)          # (n, J)
    rm = jnp.asarray(rot_mask, w.dtype).reshape(-1, 1, 1)
    u = cross(w, c)
    hi = jax.lax.Precision.HIGHEST     # see joint_twists: MXU bf16 default
    wF = jnp.einsum("cnb,cjb->njb", w, F, precision=hi)
    wT = jnp.einsum("cnb,cjb->njb", w, Tau, precision=hi)
    uF = jnp.einsum("cnb,cjb->njb", u, F, precision=hi)
    per = rm * (wT - uF) + (1.0 - rm) * wF                    # (n, J, B)
    return jnp.einsum("njb,nj->nb", per, anc, precision=hi)


def contact_terms(struct: Structure, model: Model, q, v):
    """(Q (n, B), tac_force (3, Mtot, B) world marker forces).

    Geometric-twist formulation (see block comment above): identical math to
    ``contact_terms_ad`` — point velocities are exact FK derivatives, and Q
    is the exact J^T f with force application points held fixed in their
    body/joint frames (matching the reference's adjoint convention)."""
    groups = struct.contact_groups
    ntac = len(struct.tac_joint)
    dtype = q.dtype
    B = q.shape[1]
    if not groups:
        return jnp.zeros_like(q), jnp.zeros((3, ntac, B), dtype)

    J = struct.njoints
    jp, jq = fk_joints(struct, model, q)
    bj = np.asarray(struct.body_joint)
    bp, bquat = transform_compose(jp[:, bj], jq[:, bj],
                                  _col(model.body_pos, dtype),
                                  _col(model.body_quat, dtype))
    bR = quat_to_mat(bquat)
    pts_list = []
    for arr, jidx in ((model.cp_pos, struct.cp_joint),
                      (model.tac_pos, struct.tac_joint)):
        if len(jidx) == 0:
            pts_list.append(jnp.zeros((3, 0, B), dtype))
        else:
            idx = np.asarray(jidx)
            pts_list.append(jp[:, idx] + quat_rotate(
                jq[:, idx], jnp.asarray(arr, dtype).T[:, :, None]))
    pts = jnp.concatenate(pts_list, axis=1)
    pts_joint = np.concatenate([np.asarray(struct.cp_joint, np.int64),
                                np.asarray(struct.tac_joint, np.int64)])

    w, c, rot_mask = dof_frames(struct, model, q, jp, jq)
    Omega, beta = joint_twists(struct, w, c, rot_mask, v)
    params = contact.combined_params(model).astype(dtype)     # (K, 4)

    F_acc = jnp.zeros((3, J, B), dtype)
    Tau_acc = jnp.zeros((3, J, B), dtype)
    tac_force = jnp.zeros((3, ntac + 1, B), dtype)

    for g in groups:
        if g.sphere_general:
            gbody = np.asarray(g.point_idx)
            x = bp[:, gbody]
            gjoint = bj[gbody]
        else:
            pidx_pts = np.asarray(g.point_idx)
            x = pts[:, pidx_pts]
            gjoint = pts_joint[pidx_pts]
        phi, nrm = _group_sdf(g, struct, model, x, bp, bR)
        if g.sphere_general:
            r = jnp.asarray(model.body_size, dtype)[np.asarray(g.point_idx), 0]
            phi = phi - r[:, None]
            x_eff = x - r[None, :, None] * nrm
        else:
            x_eff = x
        v_pt = cross(Omega[:, gjoint], x_eff) + beta[:, gjoint]
        if g.gtype == contact.GROUND:
            v_rel = v_pt
        else:
            pj = bj[np.asarray(g.prim_body)]
            v_prim = cross(Omega[:, pj], x_eff) + beta[:, pj]
            v_rel = v_pt - v_prim
        prm = _select_params(params, g.param_idx)             # (4, N, 1|B)
        f = _penalty_force(phi, nrm, v_rel, prm)

        # tactile rows (world marker forces for the sensor query)
        rows = np.asarray(g.tac_row) + 1
        mask = jnp.asarray([1.0 if rr >= 0 else 0.0 for rr in g.tac_row],
                           dtype)[None, :, None]
        tac_force = tac_force.at[:, rows].add(f * mask)

        # wrench accumulation: +f at x_app on the general side, -f on the
        # primitive side. Application points are held FIXED in their local
        # frames under differentiation (stop_gradient on the local coords) —
        # the exact convention of contact_terms_ad / dynamics.contact_terms,
        # so chord iterates and IFT gradients match the oracle to round-off.
        if g.sphere_general:
            qg = bquat[:, gbody]
            xi_g = jax.lax.stop_gradient(
                quat_rotate(quat_conj(qg), x_eff - x))
            x_app_g = x + quat_rotate(qg, xi_g)
        else:
            x_app_g = x                       # FK point; local coords constant
        F_acc = F_acc.at[:, gjoint].add(f)
        Tau_acc = Tau_acc.at[:, gjoint].add(cross(x_app_g, f))
        if g.gtype != contact.GROUND:
            pb_idx = np.asarray(g.prim_body)
            qp = bquat[:, pb_idx]
            xi_p = jax.lax.stop_gradient(
                quat_rotate(quat_conj(qp), x_eff - bp[:, pb_idx]))
            x_app_p = bp[:, pb_idx] + quat_rotate(qp, xi_p)
            F_acc = F_acc.at[:, pj].add(-f)
            Tau_acc = Tau_acc.at[:, pj].add(cross(x_app_p, -f))

    Q = wrench_to_Q(struct, w, c, rot_mask, F_acc, Tau_acc)
    return Q, tac_force[:, 1:]


def contact_terms_ad(struct: Structure, model: Model, q, v):
    """AD (linearize + linear_transpose) formulation — the original hot path,
    kept as the parity oracle for ``contact_terms`` (tests/test_lanes.py)."""
    groups = struct.contact_groups
    ntac = len(struct.tac_joint)
    dtype = q.dtype
    B = q.shape[1]
    if not groups:
        return jnp.zeros_like(q), jnp.zeros((3, ntac, B), dtype)

    fk = lambda qq: fk_all(struct, model, qq)
    (bp, bquat, pts), fk_lin = jax.linearize(fk, q)
    bv, bquatd, pts_dot = fk_lin(v)
    bw = 2.0 * quat_mul(bquatd, quat_conj(bquat))[1:]
    bR = quat_to_mat(bquat)
    params = contact.combined_params(model).astype(dtype)   # (K, 4)

    per_group = []
    for g in groups:
        gi = np.asarray(g.general_body)
        if g.sphere_general:
            x = bp[:, np.asarray(g.point_idx)]
        else:
            x = pts[:, np.asarray(g.point_idx)]
        phi, n = _group_sdf(g, struct, model, x, bp, bR)
        if g.sphere_general:
            r = jnp.asarray(model.body_size, dtype)[np.asarray(g.point_idx), 0]
            phi = phi - r[:, None]
            x_eff = x - r[None, :, None] * n
            v_pt = bv[:, gi] + cross(bw[:, gi], x_eff - x)
        else:
            x_eff = x
            v_pt = pts_dot[:, np.asarray(g.point_idx)]
        if g.gtype == contact.GROUND:
            v_prim = jnp.zeros_like(x_eff)
            xi_p = jnp.zeros_like(x_eff)
        else:
            pidx = np.asarray(g.prim_body)
            p_b = bp[:, pidx]
            R_b = bR[:, :, pidx]
            v_prim = bv[:, pidx] + cross(bw[:, pidx], x_eff - p_b)
            xi_p = mat_tvec(R_b, x_eff - p_b)
        prm = _select_params(params, g.param_idx)                  # (4, N, .)
        f = _penalty_force(phi, n, v_pt - v_prim, prm)
        per_group.append((g, f, x, x_eff, xi_p))

    tac_force = jnp.zeros((3, ntac + 1, B), dtype)
    for g, f, *_ in per_group:
        rows = np.asarray(g.tac_row) + 1
        mask = jnp.asarray([1.0 if r >= 0 else 0.0 for r in g.tac_row],
                           dtype)[None, :, None]
        tac_force = tac_force.at[:, rows].add(f * mask)
    tac_force = tac_force[:, 1:]

    NB = struct.nbodies
    bp_bar = jnp.zeros((3, NB, B), dtype)
    bquat_bar = jnp.zeros((4, NB, B), dtype)
    pts_bar = jnp.zeros_like(pts)
    for g, f, x, x_eff, xi_p in per_group:
        if g.sphere_general:
            gi = np.asarray(g.point_idx)
            qg = bquat[:, gi]
            xi_g = jax.lax.stop_gradient(
                quat_rotate(quat_conj(qg), x_eff - bp[:, gi]))
            bp_bar = bp_bar.at[:, gi].add(f)
            bquat_bar = bquat_bar.at[:, gi].add(_rotate_vjp(qg, xi_g, f))
        else:
            pts_bar = pts_bar.at[:, np.asarray(g.point_idx)].add(f)
        if g.gtype != contact.GROUND:
            pi = np.asarray(g.prim_body)
            qp = bquat[:, pi]
            bp_bar = bp_bar.at[:, pi].add(-f)
            bquat_bar = bquat_bar.at[:, pi].add(
                _rotate_vjp(qp, jax.lax.stop_gradient(xi_p), -f))

    transpose = jax.linear_transpose(fk_lin, q)
    (Q,) = transpose((bp_bar, bquat_bar, pts_bar))
    return Q, tac_force


def _sphere_group_wrenches(struct, model, g, bp, bquat, bR, Omega, beta,
                           params, F_acc, Tau_acc):
    """Analytic sphere-center contact contributions (jnp — a handful of
    points; shared by contact_terms and the fused path)."""
    dtype = bp.dtype
    bj = np.asarray(struct.body_joint)
    gbody = np.asarray(g.point_idx)
    x = bp[:, gbody]
    gjoint = bj[gbody]
    phi, nrm = _group_sdf(g, struct, model, x, bp, bR)
    r = jnp.asarray(model.body_size, dtype)[gbody, 0]
    phi = phi - r[:, None]
    x_eff = x - r[None, :, None] * nrm
    v_pt = cross(Omega[:, gjoint], x_eff) + beta[:, gjoint]
    if g.gtype == contact.GROUND:
        v_rel = v_pt
    else:
        pj = bj[np.asarray(g.prim_body)]
        v_prim = cross(Omega[:, pj], x_eff) + beta[:, pj]
        v_rel = v_pt - v_prim
    prm = _select_params(params, g.param_idx)
    f = _penalty_force(phi, nrm, v_rel, prm)
    qg = bquat[:, gbody]
    xi_g = jax.lax.stop_gradient(quat_rotate(quat_conj(qg), x_eff - x))
    x_app_g = x + quat_rotate(qg, xi_g)
    F_acc = F_acc.at[:, gjoint].add(f)
    Tau_acc = Tau_acc.at[:, gjoint].add(cross(x_app_g, f))
    if g.gtype != contact.GROUND:
        pb_idx = np.asarray(g.prim_body)
        pj = bj[pb_idx]
        qp = bquat[:, pb_idx]
        xi_p = jax.lax.stop_gradient(
            quat_rotate(quat_conj(qp), x_eff - bp[:, pb_idx]))
        x_app_p = bp[:, pb_idx] + quat_rotate(qp, xi_p)
        F_acc = F_acc.at[:, pj].add(-f)
        Tau_acc = Tau_acc.at[:, pj].add(cross(x_app_p, -f))
    return F_acc, Tau_acc


def _fused_small_stage(struct, model, q, v):
    """Joint frames, body poses, dof axes, twists — the small-array stage
    shared by the fused contact paths."""
    dtype = q.dtype
    jp, jq = fk_joints(struct, model, q)
    bj = np.asarray(struct.body_joint)
    bp, bquat = transform_compose(jp[:, bj], jq[:, bj],
                                  _col(model.body_pos, dtype),
                                  _col(model.body_quat, dtype))
    w, c, rot_mask = dof_frames(struct, model, q, jp, jq)
    Omega, beta = joint_twists(struct, w, c, rot_mask, v)
    return jp, jq, bp, bquat, w, c, rot_mask, Omega, beta


def contact_terms_fused(struct: Structure, model: Model, q, v, pw, pw_meta):
    """contact_terms with the heavy per-point pipeline in the fused Pallas
    pair-wrench kernel (ops/lane_contact.py); sphere_general groups stay
    jnp. Differentiation goes through the kernel's custom VJP (jnp twin) —
    same conventions, pinned by tests/test_lane_contact.py."""
    from ..ops import lane_contact
    segments, n_rows, src_idx, packed_rows = pw_meta
    dtype = q.dtype
    B = q.shape[1]
    ntac = len(struct.tac_joint)
    jp, jq, bp, bquat, w, c, rot_mask, Omega, beta = _fused_small_stage(
        struct, model, q, v)
    params = contact.combined_params(model).astype(dtype)
    xi_packed = lane_contact.pack_points(struct, model, src_idx)
    F, Tau, tac = pw(jp, jq, Omega, beta, bp, bquat,
                     jnp.asarray(model.body_size, dtype), params,
                     jnp.asarray(model.ground_pos, dtype),
                     jnp.asarray(model.ground_normal, dtype),
                     xi_packed.astype(dtype))
    sphere_groups = [g for g in struct.contact_groups if g.sphere_general]
    if sphere_groups:
        bR = quat_to_mat(bquat)
        for g in sphere_groups:
            F, Tau = _sphere_group_wrenches(struct, model, g, bp, bquat, bR,
                                            Omega, beta, params, F, Tau)
    Q = wrench_to_Q(struct, w, c, rot_mask, F, Tau)
    return Q, tac


def tactile_field_fused(struct: Structure, model: Model, q, v, pw, pw_meta):
    """(Mtot, 3, B) sensor-frame marker forces via the fused kernel."""
    _, tac_force = contact_terms_fused(struct, model, q, v, pw, pw_meta)
    jp, jq = fk_joints(struct, model, q)
    idx = np.asarray(struct.tac_joint)
    qw = jq[:, idx]
    dtype = q.dtype
    n_w = quat_rotate(qw, jnp.asarray(model.tac_normal, dtype).T[:, :, None])
    a0_w = quat_rotate(qw, jnp.asarray(model.tac_axis0, dtype).T[:, :, None])
    a1_w = quat_rotate(qw, jnp.asarray(model.tac_axis1, dtype).T[:, :, None])
    return jnp.stack([jnp.sum(tac_force * a0_w, axis=0),
                      jnp.sum(tac_force * a1_w, axis=0),
                      jnp.sum(tac_force * n_w, axis=0)], axis=1)


def applied_forces(struct: Structure, model: Model, q, v, u):
    Q_contact, tac_force = contact_terms(struct, model, q, v)
    Q = (joint_spring_forces(model, q, v)
         + motor_forces(struct, model, q, v, u)
         + Q_contact)
    return Q, tac_force


def tactile_field(struct: Structure, model: Model, q, v):
    """(Mtot, 3, B) sensor-frame [shear0, shear1, normal] marker forces."""
    _, tac_force = contact_terms(struct, model, q, v)
    jp, jq = fk_joints(struct, model, q)
    idx = np.asarray(struct.tac_joint)
    qw = jq[:, idx]
    dtype = q.dtype
    n_w = quat_rotate(qw, jnp.asarray(model.tac_normal, dtype).T[:, :, None])
    a0_w = quat_rotate(qw, jnp.asarray(model.tac_axis0, dtype).T[:, :, None])
    a1_w = quat_rotate(qw, jnp.asarray(model.tac_axis1, dtype).T[:, :, None])
    return jnp.stack([jnp.sum(tac_force * a0_w, axis=0),
                      jnp.sum(tac_force * a1_w, axis=0),
                      jnp.sum(tac_force * n_w, axis=0)], axis=1)


# ---------------------------------------------------------------------------
# per-lane dense linear algebra  (A (n, n, B))
# ---------------------------------------------------------------------------

def gauss_factor(A):
    """Unrolled no-pivot LU over lanes: returns (n, n, B) with L below /
    U on+above the diagonal. The iteration matrix is a perturbed SPD mass
    matrix, so pivoting is unnecessary; callers add a scaled ridge."""
    n = A.shape[0]
    rows = [[A[i, j] for j in range(n)] for i in range(n)]
    for k in range(n):
        inv = 1.0 / rows[k][k]
        for i in range(k + 1, n):
            f = rows[i][k] * inv
            rows[i][k] = f
            for j in range(k + 1, n):
                rows[i][j] = rows[i][j] - f * rows[k][j]
    return jnp.stack([jnp.stack(r) for r in rows])


def gauss_solve(lu, b):
    """Solve with gauss_factor output; b (n, B) -> x (n, B)."""
    n = lu.shape[0]
    x = [b[i] for i in range(n)]
    for i in range(n):
        for j in range(i):
            x[i] = x[i] - lu[i, j] * x[j]
    for i in reversed(range(n)):
        for j in range(i + 1, n):
            x[i] = x[i] - lu[i, j] * x[j]
        x[i] = x[i] / lu[i, i]
    return jnp.stack(x)


def gauss_solve_T(lu, b):
    """Solve A^T x = b with gauss_factor(A) output (A = L U, unit-lower L):
    forward substitution with U^T (lower, diag U_ii), then back substitution
    with L^T (unit upper). Used by the stale-LU IFT adjoint."""
    n = lu.shape[0]
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for j in range(i):
            acc = acc - lu[j, i] * y[j]
        y[i] = acc / lu[i, i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for j in range(i + 1, n):
            acc = acc - lu[j, i] * x[j]
        x[i] = acc
    return jnp.stack(x)


# ---------------------------------------------------------------------------
# implicit stepper  (mirrors integrators.py, batch-last)
# ---------------------------------------------------------------------------

class StepInputs(NamedTuple):
    model: Model
    u: jnp.ndarray        # (nu, B)
    q_base: jnp.ndarray   # (n, B)
    p_base: jnp.ndarray   # (n, B)
    gamma: jnp.ndarray    # (1, B) or (1, 1)


class LaneSimState(NamedTuple):
    q: jnp.ndarray
    qdot: jnp.ndarray
    q_prev: jnp.ndarray
    qdot_prev: jnp.ndarray
    t: jnp.ndarray        # (B,) int32


def make_residual(struct: Structure, fused_pw=None):
    """``fused_pw = (pw, pw_meta)`` routes the contact chain through the
    fused Pallas pair-wrench kernel (ops/lane_contact.py)."""
    def residual(v_new, inputs: StepInputs):
        qn = inputs.q_base + inputs.gamma * v_new
        dLdq, p_new = el_terms_pair(struct, inputs.model, qn, v_new)
        if fused_pw is not None:
            Qc, _ = contact_terms_fused(struct, inputs.model, qn, v_new,
                                        *fused_pw)
            Q = (joint_spring_forces(inputs.model, qn, v_new)
                 + motor_forces(struct, inputs.model, qn, v_new, inputs.u)
                 + Qc)
        else:
            Q, _ = applied_forces(struct, inputs.model, qn, v_new, inputs.u)
        return p_new - inputs.p_base - inputs.gamma * (dLdq + Q)
    return residual


def el_terms_pair(struct, model, q, v):
    return el_terms(struct, model, q, v)


def _ridge(J):
    """J (n, n, B) + scale-aware ridge — EXACT lane-major twin of
    ``integrators._ridged``; any formula divergence between the two layouts
    breaks chord-iterate parity (tests/test_lanes.py)."""
    from .integrators import ridge_eps
    n = J.shape[0]
    diag_mag = sum(jnp.abs(J[i, i]) for i in range(n)) / n   # (B,)
    ridge = ridge_eps(J.dtype) * (diag_mag + 1.0)
    return J + ridge[None, None] * jnp.eye(n, dtype=J.dtype)[:, :, None]


def _newton(residual_fn, max_iter, tol, inputs, v_guess):
    """Chord iteration over lanes (mirrors integrators._newton)."""
    n = v_guess.shape[0]
    dtype = v_guess.dtype
    f32 = dtype == jnp.float32
    rel = 1e-4 if f32 else 1e-7

    r0, lin = jax.linearize(lambda vv: residual_fn(vv, inputs), v_guess)
    # ONE vmapped application of the linearized residual over all n basis
    # tangents (vs n inlined copies of the JVP graph — ~n x smaller XLA
    # program, same values)
    tangents = jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None],
                                (n,) + v_guess.shape)
    Jcols = jax.vmap(lin)(tangents)        # Jcols[k, i] = dr_i/dv_k
    J = jnp.swapaxes(Jcols, 0, 1)          # J[i, k] = dr_i/dv_k
    lu = gauss_factor(_ridge(J))

    rn0 = jnp.sqrt(jnp.sum(r0 * r0, axis=0))            # (B,)
    tol_eff = jnp.maximum(jnp.asarray(tol, dtype), rel * rn0)

    def body(i, carry):
        v, r, rn, v_best, rn_best = carry
        dv = gauss_solve(lu, r)
        v2 = jnp.where(rn <= tol_eff, v, v - dv)
        r2 = residual_fn(v2, inputs)
        rn2 = jnp.sqrt(jnp.sum(r2 * r2, axis=0))
        better = rn2 < rn_best
        v_best = jnp.where(better, v2, v_best)
        rn_best = jnp.where(better, rn2, rn_best)
        return v2, r2, rn2, v_best, rn_best

    carry = (v_guess, r0, rn0, v_guess, rn0)
    *_, v_best, _ = jax.lax.fori_loop(0, max_iter, body, carry)
    return v_best


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def newton_solve(residual_fn, max_iter, tol, inputs: StepInputs, v_guess):
    return _newton(residual_fn, max_iter, tol, inputs, v_guess)


def _newton_fwd(residual_fn, max_iter, tol, inputs, v_guess):
    v_star = _newton(residual_fn, max_iter, tol, inputs, v_guess)
    return v_star, (inputs, v_star)


def _newton_bwd(residual_fn, max_iter, tol, res, g):
    """IFT adjoint per lane: solve J^T lam = g, then pull -lam back through
    the residual for the inputs cotangent."""
    inputs, v_star = res
    _, pullback = jax.vjp(residual_fn, v_star, inputs)
    n = v_star.shape[0]
    dtype = v_star.dtype
    # ONE vmapped pullback over all n cotangent basis vectors (see _newton)
    cots = jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None],
                            (n,) + v_star.shape)
    J = jax.vmap(lambda c: pullback(c)[0])(cots)   # J[i, k] = dr_i/dv_k
    JT = jnp.swapaxes(J, 0, 1)                     # (k, i, B)
    lu = gauss_factor(_ridge(JT))
    lam = gauss_solve(lu, g)
    inputs_bar = pullback(-lam)[1]
    return inputs_bar, jnp.zeros_like(v_star)


newton_solve.defvjp(_newton_fwd, _newton_bwd)


# ---------------------------------------------------------------------------
# amortized-chord stepper: linearize + LU-factor ONCE per env step (frame_skip
# substeps), reuse the factor for every chord iteration of every substep.
#
# Why: PROFILE_r03.json — at B=1024 the per-substep jacobian_linearize is
# 2.63 ms, the single largest line of the 5.78 ms forward substep. The chord
# premise already accepts a stale Jacobian within a substep; over one env
# step (5 substeps, h=5e-3) the state drifts by ~h*v per substep, so the
# factor stays a valid chord preconditioner. Best-iterate tracking guards the
# occasional contact-switch substep; accuracy is pinned by
# bench_solver_accuracy.py --refresh (artifacts/SOLVER_ACCURACY_r04.jsonl).
# ---------------------------------------------------------------------------


def make_chord_lu(residual_fn, inputs: StepInputs, v_guess,
                  reverse: bool = False):
    """Linearize the residual at (inputs, v_guess) and LU-factor the ridge-
    guarded Jacobian. stop_gradient'd: the factor is a solver ingredient, not
    a differentiated quantity (the IFT adjoint owns gradient exactness).

    ``reverse`` builds J from vmapped VJP pullbacks instead of jax.linearize
    — required when the residual contains custom_vjp ops (the fused Pallas
    contact kernel blocks forward-mode)."""
    inputs = jax.lax.stop_gradient(inputs)
    v_guess = jax.lax.stop_gradient(v_guess)
    n = v_guess.shape[0]
    basis = jnp.broadcast_to(jnp.eye(n, dtype=v_guess.dtype)[:, :, None],
                             (n,) + v_guess.shape)
    if reverse:
        _, pullback = jax.vjp(lambda vv: residual_fn(vv, inputs), v_guess)
        J = jax.vmap(lambda cot: pullback(cot)[0])(basis)  # row i = J[i, :]
    else:
        _, lin = jax.linearize(lambda vv: residual_fn(vv, inputs), v_guess)
        Jcols = jax.vmap(lin)(basis)
        J = jnp.swapaxes(Jcols, 0, 1)
    return gauss_factor(_ridge(J))


def _chord(residual_fn, max_iter, tol, inputs, v_guess, lu):
    """Chord iteration with a PROVIDED LU factor (cf. _newton, which
    linearizes itself). One extra residual eval for r0."""
    dtype = v_guess.dtype
    rel = 1e-4 if dtype == jnp.float32 else 1e-7
    r0 = residual_fn(v_guess, inputs)
    rn0 = jnp.sqrt(jnp.sum(r0 * r0, axis=0))
    tol_eff = jnp.maximum(jnp.asarray(tol, dtype), rel * rn0)

    def body(i, carry):
        v, r, rn, v_best, rn_best = carry
        dv = gauss_solve(lu, r)
        v2 = jnp.where(rn <= tol_eff, v, v - dv)
        r2 = residual_fn(v2, inputs)
        rn2 = jnp.sqrt(jnp.sum(r2 * r2, axis=0))
        better = rn2 < rn_best
        v_best = jnp.where(better, v2, v_best)
        rn_best = jnp.where(better, rn2, rn_best)
        return v2, r2, rn2, v_best, rn_best

    carry = (v_guess, r0, rn0, v_guess, rn0)
    *_, v_best, _ = jax.lax.fori_loop(0, max_iter, body, carry)
    return v_best


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def chord_solve(residual_fn, max_iter, tol, bwd_mode, inputs: StepInputs,
                v_guess, lu):
    return _chord(residual_fn, max_iter, tol, inputs, v_guess, lu)


def _chord_fwd(residual_fn, max_iter, tol, bwd_mode, inputs, v_guess, lu):
    v_star = _chord(residual_fn, max_iter, tol, inputs, v_guess, lu)
    if bwd_mode == "fwdfac":
        # factor the EXACT Jacobian at the solution HERE, in the forward
        # pass (measured cheaper than inside the reverse-of-scan context),
        # and hand it to the adjoint — same matrix the 'exact' mode builds
        # in the backward, so gradients are identical
        lu = make_chord_lu(residual_fn, inputs, v_star, reverse=True)
    return v_star, (inputs, v_star, lu)


def _chord_bwd(residual_fn, max_iter, tol, bwd_mode, res, g):
    """IFT adjoint. bwd_mode:
      'refine'  — iterative refinement: solve J^T lam = g with the STALE
                  forward LU as preconditioner and EXACT J^T lam products
                  (VJP pullbacks at the converged iterate). Converges at the
                  chord rate, so a few sweeps reach the exact adjoint at the
                  cost of k pullbacks instead of an n-wide Jacobian rebuild
                  (r04 study: cos == 'exact' to 3 decimals at k=3).
      'refine<k>' — same with k sweeps (e.g. 'refine5').
      'exact'   — rebuild J^T at the converged iterate via n vmapped
                  pullbacks + LU (cf. _newton_bwd).
      'stale'   — reuse the forward chord LU alone. NOT shipped: measured
                  grad cos 0.39 (adjoint error compounds through BPTT);
                  kept for A/B runs."""
    inputs, v_star, lu = res
    _, pullback = jax.vjp(residual_fn, v_star, inputs)
    if bwd_mode in ("stale", "fwdfac"):
        # 'fwdfac': lu is the EXACT at-solution factor saved by the forward
        lam = gauss_solve_T(lu, g)
    elif bwd_mode.startswith("refine"):
        # best-iterate safeguard: refinement diverges on lanes where the
        # stale factor is not a contraction for J^T at v* (contact switched
        # mid-env-step) — keep the lambda with the smallest exact residual
        # per lane (NaN/inf iterates compare False and are never kept)
        k = int(bwd_mode[6:]) if len(bwd_mode) > 6 else 2
        lam = gauss_solve_T(lu, g)
        r = g - pullback(lam)[0]                 # exact residual g - J^T lam
        rn = jnp.sum(r * r, axis=0)
        lam_best, rn_best = lam, rn
        for _ in range(k):
            lam = lam + gauss_solve_T(lu, r)
            r = g - pullback(lam)[0]
            rn = jnp.sum(r * r, axis=0)
            better = rn < rn_best
            lam_best = jnp.where(better, lam, lam_best)
            rn_best = jnp.where(better, rn, rn_best)
        lam = lam_best
    else:
        n = v_star.shape[0]
        cots = jnp.broadcast_to(
            jnp.eye(n, dtype=v_star.dtype)[:, :, None],
            (n,) + v_star.shape)
        # v-only vjp for the J rows: keeps the vmapped pullbacks free of the
        # (unused) inputs-cotangent graph
        _, pb_v = jax.vjp(lambda vv: residual_fn(vv, inputs), v_star)
        J = jax.vmap(lambda c: pb_v(c)[0])(cots)
        JT = jnp.swapaxes(J, 0, 1)
        lam = gauss_solve(gauss_factor(_ridge(JT)), g)
    inputs_bar = pullback(-lam)[1]
    return inputs_bar, jnp.zeros_like(v_star), jnp.zeros_like(lu)


chord_solve.defvjp(_chord_fwd, _chord_bwd)


def build_env_step(struct: Structure, frame_skip: int, *, refresh: int = 0,
                   bwd_mode: str = "exact", max_iter: int = 0,
                   fused_pw=None):
    """Fused frame_skip-substep sim step with chord-LU amortization.

    env_step(model, state, u) advances ``frame_skip`` implicit substeps under
    one held control. The chord Jacobian is linearized + factored every
    ``refresh`` substeps (0 => once per env step — the amortized default;
    1 => per substep, matching scan of build_step exactly when
    bwd_mode='exact'). ``max_iter`` overrides the scene's chord budget.
    ``fused_pw = (pw, meta)`` from ops.lane_contact.make_pair_wrenches routes
    the contact chain through the fused Pallas kernel.
    """
    residual_fn = make_residual(struct, fused_pw)
    miter = max_iter or struct.solver_max_iter
    use_bdf2 = struct.integrator.upper() == "BDF2"
    refresh = refresh or frame_skip
    reverse_lu = fused_pw is not None

    def bases(model, state, h, dtype):
        p_now = momentum(struct, model, state.q, state.qdot)
        if use_bdf2:
            first = (state.t == 0)[None]
            p_prev = momentum(struct, model, state.q_prev, state.qdot_prev)
            gamma = jnp.where(first, h, 2.0 * h / 3.0).astype(dtype)
            q_base = jnp.where(first, state.q,
                               (4.0 * state.q - state.q_prev) / 3.0)
            p_base = jnp.where(first, p_now, (4.0 * p_now - p_prev) / 3.0)
        else:
            gamma = jnp.full((1, 1), h, dtype)
            q_base, p_base = state.q, p_now
        return gamma, q_base, p_base

    def env_step(model: Model, state: LaneSimState, u):
        h = model.h
        dtype = state.q.dtype
        tol = max(struct.solver_tol, 1e-7 if dtype == jnp.float32 else 1e-12)
        u = jnp.asarray(u, dtype)

        def substep(state, lu, with_lu):
            gamma, q_base, p_base = bases(model, state, h, dtype)
            inputs = StepInputs(model=model, u=u, q_base=q_base,
                                p_base=p_base, gamma=gamma)
            if with_lu:
                lu = make_chord_lu(residual_fn, inputs, state.qdot,
                                   reverse=reverse_lu)
            v_new = chord_solve(residual_fn, miter, tol, bwd_mode,
                                inputs, state.qdot, lu)
            q_new = q_base + gamma * v_new
            return LaneSimState(q=q_new, qdot=v_new, q_prev=state.q,
                                qdot_prev=state.qdot, t=state.t + 1), lu

        if refresh >= frame_skip:
            # one linearize+factor per env step; the frame_skip-1 remaining
            # substeps share ONE scan body (compile cost ~2 substep graphs)
            state, lu = substep(state, None, True)
            if frame_skip > 1:
                state, _ = jax.lax.scan(
                    lambda s, _: (substep(s, lu, False)[0], None),
                    state, None, length=frame_skip - 1)
        else:
            def body(s, _):
                s2, _ = substep(s, None, (True if refresh == 1 else None))
                return s2, None
            if refresh == 1:
                state, _ = jax.lax.scan(body, state, None, length=frame_skip)
            else:
                lu = None
                for k in range(frame_skip):   # mixed periods: unrolled
                    state, lu = substep(state, lu, k % refresh == 0)
        return state

    return env_step


def build_step(struct: Structure):
    """step(model, state (LaneSimState, (n, B) leaves), u (nu, B)) -> state'."""
    residual_fn = make_residual(struct)
    max_iter = struct.solver_max_iter
    use_bdf2 = struct.integrator.upper() == "BDF2"

    def step(model: Model, state: LaneSimState, u):
        h = model.h
        dtype = state.q.dtype
        tol = max(struct.solver_tol, 1e-7 if dtype == jnp.float32 else 1e-12)
        p_now = momentum(struct, model, state.q, state.qdot)
        if use_bdf2:
            first = (state.t == 0)[None]   # (1, B)
            p_prev = momentum(struct, model, state.q_prev, state.qdot_prev)
            gamma = jnp.where(first, h, 2.0 * h / 3.0).astype(dtype)
            q_base = jnp.where(first, state.q,
                               (4.0 * state.q - state.q_prev) / 3.0)
            p_base = jnp.where(first, p_now, (4.0 * p_now - p_prev) / 3.0)
        else:
            gamma = jnp.full((1, 1), h, dtype)
            q_base, p_base = state.q, p_now
        inputs = StepInputs(model=model, u=jnp.asarray(u, dtype),
                            q_base=q_base, p_base=p_base, gamma=gamma)
        v_new = newton_solve(residual_fn, max_iter, tol, inputs, state.qdot)
        q_new = q_base + gamma * v_new
        return LaneSimState(q=q_new, qdot=v_new, q_prev=state.q,
                            qdot_prev=state.qdot, t=state.t + 1)

    return step


def to_lanes(state_batch):
    """SimState with (B, n) leaves (vmap layout) -> LaneSimState (n, B)."""
    return LaneSimState(q=state_batch.q.T, qdot=state_batch.qdot.T,
                        q_prev=state_batch.q_prev.T,
                        qdot_prev=state_batch.qdot_prev.T,
                        t=jnp.atleast_1d(state_batch.t))
