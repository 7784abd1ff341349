"""Whole-env-step fused Pallas program — the BPTT speed-of-light path.

PROFILE_r04.json attributes the 33.5 ms fwd+grad TactilePush env step
(B = 1024) almost entirely to XLA op-dispatch overhead and HBM round-trips
of (., B)-shaped intermediates: the fused pair-wrench kernel already reduced
one *residual eval* to 0.052 ms, but each env step still issues ~45 residual
evals + adjoint solves as hundreds of separate XLA ops on tiny (3, 7, 1024)
tensors.

This module compiles the ENTIRE amortized-chord env step — frame_skip
implicit substeps, chord iterations, the per-env-step Jacobian factor, and
(in the backward program) the exact at-solution IFT adjoint chain — into ONE
Pallas kernel per direction. All intermediates live in VMEM; the only HBM
traffic is the (n, B) state in/out and the (frame_skip, n, B) saved solver
iterates. The per-point contact pipeline re-uses the exact formulation of
``ops.lane_contact._kernel``; kinematics/dynamics (momentum-form Euler-
Lagrange, SURVEY.md C2/C3) are traced value-level INSIDE the kernel with
``jax.grad``/``jax.jvp``/``jax.vjp`` — JAX AD composes before Mosaic
lowering, so the hand-written adjoint chain is generated, not hand-derived.

Semantics == ``lanes.build_env_step(refresh=0, bwd_mode='exact')`` (the
round-4 study-validated shipped config): one chord LU per env step for the
forward iteration, and an exact Jacobian rebuilt at each substep's converged
iterate for the adjoint. Pinned against the lanes path by
tests/test_megastep.py.

Scope (asserted at build time): BDF1 scenes, static (non-lane-batched) Model,
no sphere_general contact groups — i.e. exactly the TactilePush benchmark
scene family. Other configurations fall back to ``lanes.build_env_step``.

Reference parity: replaces the batched use of SURVEY.md C2/C3/C5/C7 like
``sim/lanes.py`` does; the reference C++ core (DiffRedMax) has no batched or
fused analogue.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.schema import (GEOM_CUBOID, GEOM_CYLINDER, GEOM_SPHERE,
                            JOINT_FREE3D_EULER, JOINT_FREE3D_EXP,
                            JOINT_REVOLUTE)
from ..sim import contact as contact_mod
from ..sim import lanes
from ..sim.contact import GROUND, _EPS
from ..sim.integrators import ridge_eps
from .lane_contact import build_segments

_LANE_BLOCK = 128


# ---------------------------------------------------------------------------
# component-list algebra: vectors are [3 x (1, Bb)], quats [4 x (1, Bb)] —
# every op is a 2D elementwise VPU op (the proven lane_contact kernel style)
# ---------------------------------------------------------------------------

def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return [aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw]


def _qconj(q):
    return [q[0], -q[1], -q[2], -q[3]]


def _qrot(q, v):
    qv = q[1:]
    t = [2.0 * c for c in _cross(qv, v)]
    u = _cross(qv, t)
    return [v[i] + q[0] * t[i] + u[i] for i in range(3)]


def _rotvec_quat(r):
    angle_sq = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
    angle = jnp.sqrt(angle_sq + 1e-12)
    half = 0.5 * angle
    small = angle_sq < 1e-8
    k = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return [w, k * r[0], k * r[1], k * r[2]]


def _euler_quat(e):
    hx, hy, hz = 0.5 * e[0], 0.5 * e[1], 0.5 * e[2]
    cx, cy, cz = jnp.cos(hx), jnp.cos(hy), jnp.cos(hz)
    sx, sy, sz = jnp.sin(hx), jnp.sin(hy), jnp.sin(hz)
    return [cx * cy * cz - sx * sy * sz,
            sx * cy * cz + cx * sy * sz,
            cx * sy * cz - sx * cy * sz,
            cx * cy * sz + sx * sy * cz]


def _quat_R(q):
    """Rows of the world-from-local rotation matrix (3x3 nested lists)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return [[1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
            [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
            [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]]


# ---------------------------------------------------------------------------
# static scene configuration (baked at build time)
# ---------------------------------------------------------------------------

class _SceneConst:
    """Host-numpy snapshot of (struct, model): every quantity the kernel
    needs becomes a compile-time constant."""

    def __init__(self, struct, model):
        self.struct = struct
        self.n = struct.ndof_q
        self.J = struct.njoints
        self.NB = struct.nbodies
        self.nu = struct.ndof_u
        tb = struct.fk_tables
        self.trans_idx = np.asarray(tb["trans_idx"], np.int64)
        self.rot_idx = np.asarray(tb["rot_idx"], np.int64)
        self.basis = np.asarray(tb["basis"], np.float64)
        self.m_rev = np.asarray(tb["m_rev"], bool)
        self.m_exp = np.asarray(tb["m_exp"], bool)
        self.m_eul = np.asarray(tb["m_eul"], bool)
        self.levels = tb["levels"]
        self.parents = np.asarray(struct.joint_parents, np.int64)
        self.joint_types = np.asarray(struct.joint_types, np.int64)
        self.body_joint = np.asarray(struct.body_joint, np.int64)
        f64 = lambda a: np.asarray(a, np.float64)
        self.joint_pos = f64(model.joint_pos)
        self.joint_quat = f64(model.joint_quat)
        self.joint_axis0 = f64(model.joint_axis0)
        self.body_pos = f64(model.body_pos)
        self.body_quat = f64(model.body_quat)
        self.body_mass = f64(model.body_mass)
        self.body_inertia = f64(model.body_inertia)
        self.body_size = f64(model.body_size)
        self.gravity = f64(model.gravity)
        self.h = float(np.asarray(model.h))
        self.dof_damping = f64(model.dof_damping)
        self.dof_lim_lower = f64(model.dof_lim_lower)
        self.dof_lim_upper = f64(model.dof_lim_upper)
        self.dof_lim_stiffness = f64(model.dof_lim_stiffness)
        self.motor_dof = np.asarray(struct.motor_dof, np.int64)
        self.motor_kp = f64(model.motor_kp)
        self.motor_kd = f64(model.motor_kd)
        self.motor_ctrl_lo = f64(model.motor_ctrl_lo)
        self.motor_ctrl_hi = f64(model.motor_ctrl_hi)
        self.motor_pos_mask = f64(model.motor_pos_mask)
        self.ground_pos = f64(model.ground_pos)
        self.ground_normal = f64(model.ground_normal)
        # contact segments + packed local point table (static — cp/tac
        # positions are design params; the mega path treats the model as
        # constant, matching bench/GD-policy training)
        segments, n_rows, src_idx, packed_rows = build_segments(struct)
        self.segments = segments
        both = []
        if len(struct.cp_joint):
            both.append(f64(model.cp_pos))
        if len(struct.tac_joint):
            both.append(f64(model.tac_pos))
        all_pts = (np.concatenate(both, axis=0) if both
                   else np.zeros((0, 3)))
        xi = np.full((n_rows, 3), 1e6)
        if len(src_idx):
            xi[packed_rows] = all_pts[src_idx]
        self.xi = xi
        params = np.concatenate([
            np.stack([f64(model.pair_kn), f64(model.pair_kt),
                      f64(model.pair_mu), f64(model.pair_damping)], axis=-1),
            np.stack([f64(model.tac_kn), f64(model.tac_kt),
                      f64(model.tac_mu), f64(model.tac_damping)], axis=-1),
        ], axis=0) if len(model.pair_kn) + len(model.tac_kn) else \
            np.zeros((0, 4))
        self.params = params
        # per-dof ancestor mask for twists / generalized forces
        self.anc = np.asarray(lanes._dof_tables(struct), bool)   # (n, J)

    def xi_cols(self, dtype):
        return tuple(jnp.asarray(self.xi[:, i:i + 1], dtype)
                     for i in range(3))

    # -- kinematics (value-level; q is (n, Bb)) ---------------------------
    def fk_joints(self, q):
        return self.fk_joints_rows(tuple(q[i:i + 1] for i in range(self.n)))

    def fk_joints_rows(self, qrows):
        """fk on a TUPLE of (1, Bb) rows. The row split happens OUTSIDE any
        grad/vjp closure: reverse-mode through this function is slice-free,
        so a second transpose (vjp of a kernel-internal grad) never produces
        the negative-config lax.pad Mosaic cannot lower."""
        dtype = qrows[0].dtype
        z = jnp.zeros_like(qrows[0])

        def qrow(i):
            return qrows[int(i)] if int(i) < self.n else z

        jp = [None] * self.J
        jq = [None] * self.J
        for j in range(self.J):
            ti = self.trans_idx[j]
            qt = [qrow(ti[k]) for k in range(3)]
            bss = self.basis[j]
            tl = [sum(float(bss[i, k]) * qt[k] for k in range(3))
                  for i in range(3)]
            ri = self.rot_idx[j]
            if self.m_rev[j]:
                ax = self.joint_axis0[j]
                ang = qrow(ri[0])
                half = 0.5 * ang
                s = jnp.sin(half)
                ql = [jnp.cos(half), float(ax[0]) * s, float(ax[1]) * s,
                      float(ax[2]) * s]
            elif self.m_exp[j]:
                ql = _rotvec_quat([qrow(ri[k]) for k in range(3)])
            elif self.m_eul[j]:
                ql = _euler_quat([qrow(ri[k]) for k in range(3)])
            else:
                one = jnp.ones_like(z)
                ql = [one, z, z, z]
            jqc = [jnp.asarray(v, dtype) for v in self.joint_quat[j]]
            jpc = [jnp.asarray(v, dtype) for v in self.joint_pos[j]]
            rot_tl = _qrot(jqc, tl)
            p_loc = [jpc[i] + rot_tl[i] for i in range(3)]
            q_loc = _qmul(jqc, ql)
            par = int(self.parents[j])
            if par < 0:
                jp[j] = [jnp.broadcast_to(c, z.shape) for c in p_loc]
                jq[j] = [jnp.broadcast_to(c, z.shape) for c in q_loc]
            else:
                rp = _qrot(jq[par], p_loc)
                jp[j] = [jp[par][i] + rp[i] for i in range(3)]
                jq[j] = _qmul(jq[par], q_loc)
        return jp, jq

    def fk_bodies(self, jp, jq):
        dtype = jp[0][0].dtype
        bp, bq = [], []
        for b in range(self.NB):
            j = int(self.body_joint[b])
            bpc = [jnp.asarray(v, dtype) for v in self.body_pos[b]]
            bqc = [jnp.asarray(v, dtype) for v in self.body_quat[b]]
            r = _qrot(jq[j], bpc)
            bp.append([jp[j][i] + r[i] for i in range(3)])
            bq.append(_qmul(jq[j], bqc))
        return bp, bq

    # -- Lagrangian / momentum -------------------------------------------
    def lagrangian(self, q, v):
        """(1, Bb) Lagrangian per lane (mirrors lanes.lagrangian)."""
        return self.lagrangian_rows(
            tuple(q[i:i + 1] for i in range(self.n)),
            tuple(v[i:i + 1] for i in range(self.n)))

    def lagrangian_rows(self, qrows, vrows):
        """Lagrangian on row tuples — slice-free under AD (see
        fk_joints_rows)."""
        def fkb(qq):
            jp, jq = self.fk_joints_rows(qq)
            return self.fk_bodies(jp, jq)

        (bp, bq), (bpd, bqd) = jax.jvp(fkb, (qrows,), (vrows,))
        T = jnp.zeros_like(qrows[0])
        V = jnp.zeros_like(qrows[0])
        g = self.gravity
        for b in range(self.NB):
            w4 = _qmul(bqd[b], _qconj(bq[b]))
            w = [2.0 * w4[1], 2.0 * w4[2], 2.0 * w4[3]]
            R = _quat_R(bq[b])
            w_local = [R[0][i] * w[0] + R[1][i] * w[1] + R[2][i] * w[2]
                       for i in range(3)]
            m = float(self.body_mass[b])
            I3 = self.body_inertia[b]
            T = T + 0.5 * m * _dot(bpd[b], bpd[b]) \
                + 0.5 * sum(float(I3[i]) * w_local[i] * w_local[i]
                            for i in range(3))
            V = V - m * (float(g[0]) * bp[b][0] + float(g[1]) * bp[b][1]
                         + float(g[2]) * bp[b][2])
        return T - V

    def el_pair(self, q, v):
        """(dL/dq, dL/dv == momentum) as (n, Bb). Row split OUTSIDE the grad
        closure so the reverse-mode graph is slice-free (Mosaic-transposable
        under an outer vjp)."""
        qr = tuple(q[i:i + 1] for i in range(self.n))
        vr = tuple(v[i:i + 1] for i in range(self.n))
        gq, gv = jax.grad(
            lambda qq, vv: jnp.sum(self.lagrangian_rows(qq, vv)),
            argnums=(0, 1))(qr, vr)
        return jnp.concatenate(gq, axis=0), jnp.concatenate(gv, axis=0)

    def momentum(self, q, v):
        qr = tuple(q[i:i + 1] for i in range(self.n))
        vr = tuple(v[i:i + 1] for i in range(self.n))
        gv = jax.grad(
            lambda vv: jnp.sum(self.lagrangian_rows(qr, vv)))(vr)
        return jnp.concatenate(gv, axis=0)

    # -- dof frames / twists ---------------------------------------------
    def dof_frames(self, q, jp, jq):
        """Per-dof world axes: (w [n of 3-lists], c [n], rot_mask np)."""
        dtype = q.dtype
        z = jnp.zeros_like(q[0:1])
        one = jnp.ones_like(z)
        n = self.n

        def qrow(i):
            return q[int(i):int(i) + 1] if int(i) < n else z

        ident = [one, z, z, z]
        ws = [[z, z, z] for _ in range(n)]
        cs = [[z, z, z] for _ in range(n)]
        rot_mask = np.zeros(n)
        for j in range(self.J):
            par = int(self.parents[j])
            pq = jq[par] if par >= 0 else ident
            jqc = [jnp.asarray(v, dtype) for v in self.joint_quat[j]]
            Fq = _qmul(pq, jqc)
            for i in range(3):
                d = int(self.trans_idx[j, i])
                if d == n:
                    continue
                bcol = self.basis[j][:, i]
                ws[d] = _qrot(Fq, [float(bcol[0]) * one, float(bcol[1]) * one,
                                   float(bcol[2]) * one])
            jt = int(self.joint_types[j])
            origin = jp[j]
            if jt == JOINT_REVOLUTE:
                d = int(self.rot_idx[j, 0])
                ax = self.joint_axis0[j]
                ws[d] = _qrot(Fq, [float(ax[0]) * one, float(ax[1]) * one,
                                   float(ax[2]) * one])
                cs[d] = origin
                rot_mask[d] = 1.0
            elif jt == JOINT_FREE3D_EXP:
                ridx = self.rot_idx[j]
                r3 = [qrow(ridx[k]) for k in range(3)]
                th2 = r3[0] * r3[0] + r3[1] * r3[1] + r3[2] * r3[2]
                th = jnp.sqrt(th2 + 1e-12)
                small = th2 < 1e-8
                safe2 = jnp.where(small, 1.0, th2)
                a = jnp.where(small, 0.5 - th2 / 24.0,
                              (1.0 - jnp.cos(th)) / safe2)
                bcoef = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                                  (th - jnp.sin(th)) / (safe2 * th))
                for i in range(3):
                    e = [one if k == i else z for k in range(3)]
                    rxe = _cross(r3, e)
                    rrxe = _cross(r3, rxe)
                    col = [e[k] + a * rxe[k] + bcoef * rrxe[k]
                           for k in range(3)]
                    d = int(ridx[i])
                    ws[d] = _qrot(Fq, col)
                    cs[d] = origin
                    rot_mask[d] = 1.0
            elif jt == JOINT_FREE3D_EULER:
                ridx = self.rot_idx[j]
                ex, ey = qrow(ridx[0]), qrow(ridx[1])
                cx, sx = jnp.cos(ex), jnp.sin(ex)
                cy, sy = jnp.cos(ey), jnp.sin(ey)
                locals_ = ([one, z, z], [z, cx, sx], [sy, -sx * cy, cx * cy])
                for i in range(3):
                    d = int(ridx[i])
                    ws[d] = _qrot(Fq, locals_[i])
                    cs[d] = origin
                    rot_mask[d] = 1.0
        return ws, cs, rot_mask

    def joint_twists(self, ws, cs, rot_mask, v):
        """Per-joint (Omega, beta) 3-lists; point vel = Omega x X + beta."""
        z = jnp.zeros_like(v[0:1])
        Om = [[z, z, z] for _ in range(self.J)]
        be = [[z, z, z] for _ in range(self.J)]
        for k in range(self.n):
            vk = v[k:k + 1]
            wv = [ws[k][i] * vk for i in range(3)]
            if rot_mask[k]:
                u = _cross(ws[k], cs[k])
                bt = [-u[i] * vk for i in range(3)]
            else:
                bt = wv
            for j in range(self.J):
                if not self.anc[k, j]:
                    continue
                if rot_mask[k]:
                    Om[j] = [Om[j][i] + wv[i] for i in range(3)]
                be[j] = [be[j][i] + bt[i] for i in range(3)] \
                    if rot_mask[k] else be[j]
                if not rot_mask[k]:
                    be[j] = [be[j][i] + wv[i] for i in range(3)]
        return Om, be

    def wrench_to_Q(self, ws, cs, rot_mask, F, Tau):
        """Generalized forces (n, Bb) from per-joint wrench lists."""
        rows = []
        for k in range(self.n):
            acc = None
            if rot_mask[k]:
                u = _cross(ws[k], cs[k])
            for j in range(self.J):
                if not self.anc[k, j]:
                    continue
                if rot_mask[k]:
                    term = _dot(ws[k], Tau[j]) - _dot(u, F[j])
                else:
                    term = _dot(ws[k], F[j])
                acc = term if acc is None else acc + term
            if acc is None:
                acc = jnp.zeros_like(ws[k][0])
            rows.append(acc)
        return jnp.concatenate(rows, axis=0)

    # -- contact (mirrors ops.lane_contact._kernel, value-level, no tac) --
    def contact_wrenches(self, jp, jq, Om, be, bp, bq, xi3):
        """xi3: three (n_rows, 1) columns of the packed local point table —
        passed as kernel INPUTS (pallas forbids captured array constants)."""
        dtype = jp[0][0].dtype
        z = jnp.zeros_like(jp[0][0])
        F = [[z, z, z] for _ in range(self.J)]
        Tau = [[z, z, z] for _ in range(self.J)]
        gn = [float(v) for v in self.ground_normal]
        gdot = float(np.dot(self.ground_normal, self.ground_pos))
        for s in self.segments:
            npd = s.n_pad
            xi = [xi3[i][s.row0:s.row0 + npd] for i in range(3)]
            j = s.joint
            qj = jq[j]
            t = _cross(qj[1:], xi)
            u = _cross(qj[1:], t)
            x = [jp[j][i] + xi[i] + 2.0 * (qj[0] * t[i] + u[i])
                 for i in range(3)]
            oxx = _cross(Om[j], x)
            v_pt = [oxx[i] + be[j][i] for i in range(3)]
            prm = self.params[s.param_row]
            kn, kt, mu, damping = (float(prm[0]), float(prm[1]),
                                   float(prm[2]), float(prm[3]))
            if s.gtype == GROUND:
                phi = x[0] * gn[0] + x[1] * gn[1] + x[2] * gn[2] - gdot
                nrm = [jnp.full_like(phi, gn[i]) for i in range(3)]
                v_rel = v_pt
            else:
                pb = s.prim_body
                R = _quat_R(bq[pb])
                d = [x[i] - bp[pb][i] for i in range(3)]
                xl = [R[0][i] * d[0] + R[1][i] * d[1] + R[2][i] * d[2]
                      for i in range(3)]
                size = self.body_size[pb]
                if s.gtype == GEOM_CUBOID:
                    half = [float(size[i]) * 0.5 for i in range(3)]
                    dd = [jnp.abs(xl[i]) - half[i] for i in range(3)]
                    dmax = jnp.maximum(jnp.maximum(dd[0], dd[1]), dd[2])
                    outs = [jnp.maximum(dd[i], 0.0) for i in range(3)]
                    out_norm = jnp.sqrt(outs[0] ** 2 + outs[1] ** 2
                                        + outs[2] ** 2 + _EPS ** 2)
                    phi = jnp.where(dmax > 0, out_norm, dmax)
                    hit = [(dd[i] == dmax).astype(dtype) for i in range(3)]
                    hit_sum = hit[0] + hit[1] + hit[2]
                    gl = [jnp.where(dmax > 0, outs[i] / out_norm,
                                    hit[i] / hit_sum) * jnp.sign(xl[i])
                          for i in range(3)]
                elif s.gtype == GEOM_CYLINDER:
                    r2 = jnp.sqrt(xl[0] ** 2 + xl[1] ** 2 + _EPS ** 2)
                    dr = r2 - float(size[0])
                    dz = jnp.abs(xl[2]) - float(size[1])
                    dmax = jnp.maximum(dr, dz)
                    o_r = jnp.maximum(dr, 0.0)
                    o_z = jnp.maximum(dz, 0.0)
                    out_norm = jnp.sqrt(o_r ** 2 + o_z ** 2 + _EPS ** 2)
                    phi = jnp.where(dmax > 0, out_norm, dmax)
                    pick_r = (dr >= dz).astype(dtype)
                    c_r = jnp.where(dmax > 0, o_r / out_norm, pick_r)
                    c_z = jnp.where(dmax > 0, o_z / out_norm, 1.0 - pick_r)
                    gl = [c_r * xl[0] / r2, c_r * xl[1] / r2,
                          c_z * jnp.sign(xl[2])]
                elif s.gtype == GEOM_SPHERE:
                    r = jnp.sqrt(xl[0] ** 2 + xl[1] ** 2 + xl[2] ** 2
                                 + _EPS ** 2)
                    phi = r - float(size[0])
                    gl = [xl[i] / r for i in range(3)]
                else:
                    raise ValueError(s.gtype)
                nrm = [R[i][0] * gl[0] + R[i][1] * gl[1] + R[i][2] * gl[2]
                       for i in range(3)]
                pj = s.prim_joint
                oxp = _cross(Om[pj], x)
                v_rel = [v_pt[i] - oxp[i] - be[pj][i] for i in range(3)]

            pen = jnp.maximum(-phi, 0.0)
            vn = _dot(v_rel, nrm)
            pdot = jnp.maximum(-vn, 0.0)
            fn_mag = kn * pen + damping * pen * pdot
            vt = [v_rel[i] - vn * nrm[i] for i in range(3)]
            vt_norm = jnp.sqrt(vt[0] ** 2 + vt[1] ** 2 + vt[2] ** 2
                               + _EPS ** 2)
            cap = mu * fn_mag
            scale = cap / jnp.maximum(cap, kt * vt_norm + _EPS)
            if s.n < npd:
                valid = (jax.lax.broadcasted_iota(jnp.int32, (npd, 1), 0)
                         < s.n).astype(dtype)
            else:
                valid = 1.0
            f = [(fn_mag * nrm[i] - (kt * scale) * vt[i]) * valid
                 for i in range(3)]
            xf = _cross(x, f)
            fs = [jnp.sum(f[i], axis=0, keepdims=True) for i in range(3)]
            ts = [jnp.sum(xf[i], axis=0, keepdims=True) for i in range(3)]
            F[j] = [F[j][i] + fs[i] for i in range(3)]
            Tau[j] = [Tau[j][i] + ts[i] for i in range(3)]
            if s.gtype != GROUND:
                pj = s.prim_joint
                F[pj] = [F[pj][i] - fs[i] for i in range(3)]
                Tau[pj] = [Tau[pj][i] - ts[i] for i in range(3)]
        return F, Tau

    # -- springs / motors -------------------------------------------------
    def spring_motor_Q(self, q, v, u):
        rows = []
        for i in range(self.n):
            qi, vi = q[i:i + 1], v[i:i + 1]
            lo, hi = float(self.dof_lim_lower[i]), float(self.dof_lim_upper[i])
            stiff = float(self.dof_lim_stiffness[i])
            damp = float(self.dof_damping[i])
            acc = -damp * vi + stiff * (jnp.maximum(lo - qi, 0.0)
                                        - jnp.maximum(qi - hi, 0.0))
            rows.append(acc)
        for k, d in enumerate(self.motor_dof):
            d = int(d)
            uc = jnp.clip(u[k:k + 1], float(self.motor_ctrl_lo[k]),
                          float(self.motor_ctrl_hi[k]))
            pd = (float(self.motor_kp[k]) * (uc - q[d:d + 1])
                  - float(self.motor_kd[k]) * v[d:d + 1])
            mask = float(self.motor_pos_mask[k])
            rows[d] = rows[d] + mask * pd + (1.0 - mask) * uc
        return jnp.concatenate(rows, axis=0)

    # -- the residual -----------------------------------------------------
    def residual(self, v_new, u, q_base, p_base, xi3=None):
        """BDF1 momentum-form residual (mirrors lanes.make_residual).
        ``xi3`` defaults to the baked host table (value-level use outside
        pallas); kernels pass VMEM-loaded columns instead."""
        if xi3 is None:
            xi3 = self.xi_cols(v_new.dtype)
        h = self.h
        qn = q_base + h * v_new
        dLdq, p_new = self.el_pair(qn, v_new)
        jp, jq = self.fk_joints(qn)
        bp, bq = self.fk_bodies(jp, jq)
        ws, cs, rot_mask = self.dof_frames(qn, jp, jq)
        Om, be = self.joint_twists(ws, cs, rot_mask, v_new)
        F, Tau = self.contact_wrenches(jp, jq, Om, be, bp, bq, xi3)
        Qc = self.wrench_to_Q(ws, cs, rot_mask, F, Tau)
        Q = Qc + self.spring_motor_Q(qn, v_new, u)
        return p_new - p_base - h * (dLdq + Q)


# ---------------------------------------------------------------------------
# per-lane dense linear algebra on list-of-lists of (1, Bb)
# ---------------------------------------------------------------------------

def _ll_factor(rows, dtype):
    """No-pivot LU with scale-aware ridge (mirrors lanes.gauss_factor +
    lanes._ridge). rows: list[n] of list[n] of (1, Bb)."""
    n = len(rows)
    diag_mag = sum(jnp.abs(rows[i][i]) for i in range(n)) / n
    ridge = ridge_eps(dtype) * (diag_mag + 1.0)
    rows = [[rows[i][j] + (ridge if i == j else 0.0) for j in range(n)]
            for i in range(n)]
    for k in range(n):
        inv = 1.0 / rows[k][k]
        for i in range(k + 1, n):
            f = rows[i][k] * inv
            rows[i][k] = f
            for j in range(k + 1, n):
                rows[i][j] = rows[i][j] - f * rows[k][j]
    return rows


def _ll_solve(lu, b):
    """b: list[n] of (1, Bb)."""
    n = len(lu)
    x = list(b)
    for i in range(n):
        for j in range(i):
            x[i] = x[i] - lu[i][j] * x[j]
    for i in reversed(range(n)):
        for j in range(i + 1, n):
            x[i] = x[i] - lu[i][j] * x[j]
        x[i] = x[i] / lu[i][i]
    return x


def _rows(a):
    return [a[i:i + 1] for i in range(a.shape[0])]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _build_J_rows(sc, v_star, u, q_base, p_base, xi3):
    """Exact Jacobian J[i][k] = dr_i/dv_k at v_star as list-of-lists via n
    reverse-mode pullbacks (the fused-contact path blocks forward mode in
    the lanes twin; here everything is traceable, but reverse keeps the
    graph shared with the adjoint)."""
    n = v_star.shape[0]
    _, pb = jax.vjp(lambda vv: sc.residual(vv, u, q_base, p_base, xi3),
                    v_star)
    Jrows = []
    for i in range(n):
        # one-hot row cotangent without scatter: .at[i].set lowers to a
        # scatter primitive Pallas-TPU can't compile (even for static i)
        cot = (jax.lax.broadcasted_iota(jnp.int32, v_star.shape, 0)
               == i).astype(v_star.dtype)
        (row,) = pb(cot)                        # dr_i/dv (n, Bb)
        Jrows.append(_rows(row))
    return Jrows


def _chord_iter(sc, lu, v0, u, q_base, p_base, xi3, max_iter, tol):
    """Chord iteration with best-iterate tracking (mirrors lanes._chord)."""
    dtype = v0.dtype
    rel = 1e-4 if dtype == jnp.float32 else 1e-7
    r0 = sc.residual(v0, u, q_base, p_base, xi3)
    rn0 = jnp.sqrt(jnp.sum(r0 * r0, axis=0, keepdims=True))
    tol_eff = jnp.maximum(jnp.asarray(tol, dtype), rel * rn0)

    def body(_, carry):
        v, r, rn, v_best, rn_best = carry
        dv = jnp.concatenate(_ll_solve(lu, _rows(r)), axis=0)
        v2 = jnp.where(rn <= tol_eff, v, v - dv)
        r2 = sc.residual(v2, u, q_base, p_base, xi3)
        rn2 = jnp.sqrt(jnp.sum(r2 * r2, axis=0, keepdims=True))
        better = rn2 < rn_best
        v_best = jnp.where(better, v2, v_best)
        rn_best = jnp.where(better, rn2, rn_best)
        return v2, r2, rn2, v_best, rn_best

    carry = (v0, r0, rn0, v0, rn0)
    *_, v_best, _ = jax.lax.fori_loop(0, max_iter, body, carry)
    return v_best


def _fwd_kernel(sc, frame_skip, max_iter, tol,
                q_ref, qd_ref, u_ref, xix_ref, xiy_ref, xiz_ref,
                qo_ref, qdo_ref, vs_ref):
    q = q_ref[:, :]
    qd = qd_ref[:, :]
    u = u_ref[:, :]
    xi3 = (xix_ref[:, :], xiy_ref[:, :], xiz_ref[:, :])
    dtype = q.dtype

    # ONE chord LU per env step, at the entry state (refresh=0 semantics)
    p_base0 = sc.momentum(q, qd)
    Jrows = _build_J_rows(sc, qd, u, q, p_base0, xi3)
    lu = _ll_factor(Jrows, dtype)

    def substep(k, carry):
        q, qd = carry
        p_base = sc.momentum(q, qd)
        v = _chord_iter(sc, lu, qd, u, q, p_base, xi3, max_iter, tol)
        vs_ref[pl.ds(k, 1)] = v[None]
        return q + sc.h * v, v

    q, qd = jax.lax.fori_loop(0, frame_skip, substep, (q, qd))
    qo_ref[:, :] = q
    qdo_ref[:, :] = qd


def _bwd_kernel(sc, frame_skip, q0_ref, qd0_ref, u_ref,
                xix_ref, xiy_ref, xiz_ref, vs_ref,
                gq_ref, gqd_ref, gqp_ref, gqdp_ref,
                gq0_ref, gqd0_ref, gu_ref):
    dtype = gq_ref.dtype
    h = sc.h
    u = u_ref[:, :]
    xi3 = (xix_ref[:, :], xiy_ref[:, :], xiz_ref[:, :])
    # reconstruct per-substep entry states (q_k, qd_k) from q0 + v_stars
    qs = [q0_ref[:, :]]
    qds = [qd0_ref[:, :]]
    for k in range(frame_skip):
        v = vs_ref[k]
        qs.append(qs[-1] + h * v)
        qds.append(v)

    gq = gq_ref[:, :]
    gv = gqd_ref[:, :]
    gu = jnp.zeros_like(u)
    for k in reversed(range(frame_skip)):
        q_k, qd_k, v_star = qs[k], qds[k], vs_ref[k]
        gv_star = gv + h * gq
        p_base = sc.momentum(q_k, qd_k)
        _, pb = jax.vjp(
            lambda vv, uu, qb, pbs: sc.residual(vv, uu, qb, pbs, xi3),
            v_star, u, q_k, p_base)
        # exact at-solution J^T lam = gv_star (cf. lanes._chord_bwd 'exact')
        Jrows = _build_J_rows(sc, v_star, u, q_k, p_base, xi3)
        n = len(Jrows)
        JT = [[Jrows[i][kk] for i in range(n)] for kk in range(n)]
        lu = _ll_factor(JT, dtype)
        lam = jnp.concatenate(_ll_solve(lu, _rows(gv_star)), axis=0)
        _, bu, bq_base, bp_base = pb(-lam)
        # momentum(q_k, qd_k) pullback
        _, pbm = jax.vjp(lambda qq, vv: sc.momentum(qq, vv), q_k, qd_k)
        mq, mv = pbm(bp_base)
        new_gq = gq + bq_base + mq
        new_gv = mv
        if k == frame_skip - 1:
            # the env step's q_prev/qdot_prev outputs are q_{K-1}, qd_{K-1}
            new_gq = new_gq + gqp_ref[:, :]
            new_gv = new_gv + gqdp_ref[:, :]
        gq, gv = new_gq, new_gv
        gu = gu + bu
    gq0_ref[:, :] = gq
    gqd0_ref[:, :] = gv
    gu_ref[:, :] = gu


# ---------------------------------------------------------------------------
# public builder
# ---------------------------------------------------------------------------

def supported(struct, model) -> bool:
    """Mega-path preconditions: BDF1, static model leaves, no
    sphere_general groups."""
    if struct.integrator.upper() != "BDF1":
        return False
    if any(g.sphere_general for g in struct.contact_groups):
        return False
    if np.asarray(model.body_mass).ndim != 1:
        return False
    if np.asarray(model.pair_kn).ndim != 1:
        return False
    return True


def build_env_step_mega(struct, model, frame_skip: int, *, max_iter: int = 8,
                        interpret=None):
    """Fused whole-env-step with custom IFT adjoint.

    Returns env_step(model_ignored, state: lanes.LaneSimState, u (nu, B)) ->
    LaneSimState — drop-in for ``lanes.build_env_step(refresh=0,
    bwd_mode='exact')``. The model is BAKED at build time (host constants);
    model cotangents are not produced (policy/control gradients only, the
    bench + trainer workload). Gradients flow to (state, u).
    """
    assert supported(struct, model), "mega path preconditions not met"
    sc = _SceneConst(struct, model)
    n, nu = sc.n, sc.nu
    K = frame_skip
    tol = max(struct.solver_tol, 1e-7)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    fwd_kernel = functools.partial(_fwd_kernel, sc, K, max_iter, tol)
    bwd_kernel = functools.partial(_bwd_kernel, sc, K)
    Bb = _LANE_BLOCK

    def run_fwd(q, qd, u):
        dtype = q.dtype
        B = q.shape[-1]
        Bpad = ((B + Bb - 1) // Bb) * Bb

        def padB(a):
            a = a.astype(dtype)
            if a.shape[-1] != Bpad:
                a = jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                            + [(0, Bpad - a.shape[-1])])
            return a

        spec2 = lambda d0: pl.BlockSpec((d0, Bb), lambda b: (0, b),
                                        memory_space=pltpu.VMEM)
        spec3 = lambda d0, d1: pl.BlockSpec((d0, d1, Bb),
                                            lambda b: (0, 0, b),
                                            memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((sc.xi.shape[0], 1), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        xi = sc.xi_cols(dtype)
        qo, qdo, vs = pl.pallas_call(
            fwd_kernel,
            grid=(Bpad // Bb,),
            out_shape=(jax.ShapeDtypeStruct((n, Bpad), dtype),
                       jax.ShapeDtypeStruct((n, Bpad), dtype),
                       jax.ShapeDtypeStruct((K, n, Bpad), dtype)),
            in_specs=[spec2(n), spec2(n), spec2(nu), xspec, xspec, xspec],
            out_specs=(spec2(n), spec2(n), spec3(K, n)),
            interpret=interpret,
        )(padB(q), padB(qd), padB(u), *xi)
        return qo[:, :B], qdo[:, :B], vs[:, :, :B]

    def run_bwd(q, qd, u, vs, gq, gqd, gqp, gqdp):
        dtype = q.dtype
        B = q.shape[-1]
        Bpad = ((B + Bb - 1) // Bb) * Bb

        def padB(a):
            a = a.astype(dtype)
            if a.shape[-1] != Bpad:
                a = jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                            + [(0, Bpad - a.shape[-1])])
            return a

        spec2 = lambda d0: pl.BlockSpec((d0, Bb), lambda b: (0, b),
                                        memory_space=pltpu.VMEM)
        spec3 = lambda d0, d1: pl.BlockSpec((d0, d1, Bb),
                                            lambda b: (0, 0, b),
                                            memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((sc.xi.shape[0], 1), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        xi = sc.xi_cols(dtype)
        gq0, gqd0, gu = pl.pallas_call(
            bwd_kernel,
            grid=(Bpad // Bb,),
            out_shape=(jax.ShapeDtypeStruct((n, Bpad), dtype),
                       jax.ShapeDtypeStruct((n, Bpad), dtype),
                       jax.ShapeDtypeStruct((nu, Bpad), dtype)),
            in_specs=[spec2(n), spec2(n), spec2(nu), xspec, xspec, xspec,
                      spec3(K, n), spec2(n), spec2(n), spec2(n), spec2(n)],
            out_specs=(spec2(n), spec2(n), spec2(nu)),
            interpret=interpret,
        )(padB(q), padB(qd), padB(u), *xi, padB(vs),
          padB(gq), padB(gqd), padB(gqp), padB(gqdp))
        return gq0[:, :B], gqd0[:, :B], gu[:, :B]

    @jax.custom_vjp
    def mega(q, qd, u):
        qo, qdo, vs = run_fwd(q, qd, u)
        qprev = qo - sc.h * vs[K - 1]
        qdprev = vs[K - 2] if K >= 2 else qd
        return qo, qdo, qprev, qdprev

    def mega_fwd(q, qd, u):
        qo, qdo, vs = run_fwd(q, qd, u)
        qprev = qo - sc.h * vs[K - 1]
        qdprev = vs[K - 2] if K >= 2 else qd
        return (qo, qdo, qprev, qdprev), (q, qd, u, vs)

    def mega_bwd(res, g):
        q, qd, u, vs = res
        gqo, gqdo, gqp, gqdp = g
        # qprev = qo - h*v_{K-1}: fold its cotangent into (gqo, gv_{K-1});
        # the kernel treats gqp as the cotangent of q_{K-1} directly, and
        # q_{K-1} = qo - h v_{K-1} is the same affine relation the in-kernel
        # chain uses, so pass it through unchanged. qdprev = v_{K-2} is the
        # entry qdot of substep K-1 — also handled in-kernel.
        gq0, gqd0, gu = run_bwd(q, qd, u, vs, gqo, gqdo, gqp, gqdp)
        return gq0, gqd0, gu

    mega.defvjp(mega_fwd, mega_bwd)

    def env_step(model_arg, state, u):
        del model_arg  # baked at build time
        q, qd, qp, qdp = mega(state.q, state.qdot, jnp.asarray(u, state.q.dtype))
        return lanes.LaneSimState(q=q, qdot=qd, q_prev=qp, qdot_prev=qdp,
                                  t=state.t + frame_skip)

    env_step.scene_const = sc
    return env_step
