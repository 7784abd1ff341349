"""Fused lane-major contact pair-wrench Pallas kernel (the residual hot path).

PROFILE_r03.json: one batched residual eval costs ~0.5 ms at B=1024 and the
chord solver evaluates it ~7x per substep — the contact chain is the
dominant term. The chain works on (3, N, B) marker/contact-point arrays
(N ~ 200 for TactilePush) and in plain XLA every intermediate round-trips
HBM: ~50 x 2.4 MB ~ hundreds of MB per eval. This kernel fuses the whole
per-point pipeline

    marker/contact-point FK  (owner-joint frame -> world)
    point velocity           (owner-joint twist)
    SDF vs primitive         (ground / cuboid / cylinder / sphere)
    relative velocity        (primitive-joint twist)
    penalty force            (contact.penalty_force law)
    per-joint wrench sums    (F_j = sum f, Tau_j = sum x x f)

into one VMEM-resident Pallas program: inputs are only the SMALL per-joint
quantities (joint frames jp/jq, twists Omega/beta, body poses bp/bR — all
(., J|NB, B)) plus static per-point local coordinates; outputs are per-joint
wrenches (3, J, B) and the dense tactile rows. The (N, B)-sized intermediates
never touch HBM. Layout: points in SUBLANES, batch lanes in LANES.

Differentiation: ``pair_wrenches`` carries a ``jax.custom_vjp`` whose
backward recomputes a lane-major jnp twin (``_wrenches_ref``) and pulls the
cotangent through it — numerically identical to the existing
``lanes.contact_terms`` group loop (same material-point stop_gradient
conventions), so IFT adjoints and design-parameter gradients are unchanged.
Because the op is custom_vjp (reverse-mode only), the chord Jacobian factor
is built from vmapped VJP pullbacks, not jax.linearize (see lanes.py).

Scope: every non-sphere_general contact/tactile group (point sets vs
ground/cuboid/cylinder/sphere primitives). sphere_general groups (analytic
sphere-center contacts, e.g. a rolling ball) stay in jnp — they are a
handful of points. Covers all five reference scenes.

Reference parity: replaces the batched use of SURVEY.md C5/C6 exactly like
``lanes.contact_terms`` does; the reference C++ core has no batched analogue.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.schema import GEOM_CUBOID, GEOM_CYLINDER, GEOM_SPHERE
from ..sim.contact import GROUND, _EPS

_LANE_BLOCK = 128


@dataclasses.dataclass(frozen=True)
class Segment:
    """A run of contact points sharing (owner joint, primitive, params)."""
    row0: int          # 8-aligned row offset in the packed point table
    n: int             # actual number of points
    n_pad: int         # padded to a multiple of 8
    src0: int          # first index into the combined [cp; tac] point array
    joint: int         # owning joint of the general side
    prim_body: int     # primitive body index (-1 = ground)
    prim_joint: int    # owning joint of the primitive body (-1 = ground)
    gtype: int         # GROUND or GEOM_*
    param_row: int     # row into combined [pair; tactile] params
    tac0: int          # first tactile marker row, or -1


def build_segments(struct) -> Tuple[Tuple[Segment, ...], int, np.ndarray,
                                    np.ndarray]:
    """Split non-sphere contact groups into constant-metadata runs.

    Returns (segments, n_rows_padded, src_idx (Nsum,), packed_rows (Nsum,)):
    ``src_idx`` gathers the combined [cp_pos; tac_pos] table, ``packed_rows``
    scatters the gathered rows into the padded kernel point table.
    """
    pts_joint = np.concatenate([
        np.asarray(struct.cp_joint, np.int64),
        np.asarray(struct.tac_joint, np.int64)]) if (
            len(struct.cp_joint) + len(struct.tac_joint)) else \
        np.zeros(0, np.int64)
    body_joint = np.asarray(struct.body_joint, np.int64)

    segments = []
    src_idx, packed_rows = [], []
    row = 0
    for g in struct.contact_groups:
        if g.sphere_general:
            continue
        pidx = np.asarray(g.point_idx)
        prim = np.asarray(g.prim_body)
        par = np.asarray(g.param_idx)
        tac = np.asarray(g.tac_row)
        joints = pts_joint[pidx]
        k = 0
        N = len(pidx)
        while k < N:
            j0, pb0, pr0 = joints[k], prim[k], par[k]
            e = k + 1
            while e < N and joints[e] == j0 and prim[e] == pb0 \
                    and par[e] == pr0 \
                    and ((tac[e] < 0 and tac[k] < 0)
                         or (tac[e] >= 0 and tac[e] == tac[e - 1] + 1)):
                e += 1
            n = e - k
            n_pad = ((n + 7) // 8) * 8
            gt = int(g.gtype)
            segments.append(Segment(
                row0=row, n=n, n_pad=n_pad, src0=int(pidx[k]),
                joint=int(j0), prim_body=int(pb0) if gt != GROUND else -1,
                prim_joint=int(body_joint[pb0]) if gt != GROUND else -1,
                gtype=gt, param_row=int(pr0), tac0=int(tac[k])))
            src_idx.extend(pidx[k:e].tolist())
            packed_rows.extend(range(row, row + n))
            row += n_pad
            k = e
    n_rows = max(row, 8)
    return (tuple(segments), n_rows, np.asarray(src_idx, np.int64),
            np.asarray(packed_rows, np.int64))


# ---------------------------------------------------------------------------
# jnp twin (lane-major) — backward pass + parity oracle
# ---------------------------------------------------------------------------

def _wrenches_ref(segments, J, ntac, jp, jq, Om, be, bp, bquat, sizes,
                  params, gpos, gn, xi_packed):
    """Lane-major jnp reference of the kernel: returns (F (3,J,B),
    Tau (3,J,B), tac (3,ntac,B)). Differentiable; identical material-point
    stop_gradient conventions to lanes.contact_terms."""
    from ..sim import lanes
    dtype = jp.dtype
    B = jp.shape[-1]
    F = jnp.zeros((3, J, B), dtype)
    Tau = jnp.zeros((3, J, B), dtype)
    tac = jnp.zeros((3, max(ntac, 1), B), dtype)
    for s in segments:
        xi = xi_packed[s.row0:s.row0 + s.n].T[:, :, None]      # (3, n, 1)
        jqs = jq[:, s.joint][:, None]                          # (4, 1, B)
        prm_sel = params[s.param_row].astype(dtype)            # (4,) | (4, B)
        x = jp[:, s.joint][:, None] + lanes.quat_rotate(jqs, xi)
        v_pt = lanes.cross(Om[:, s.joint][:, None], x) + be[:, s.joint][:, None]
        if s.gtype == GROUND:
            phi = jnp.sum((x - gpos.astype(dtype)[:, None, None])
                          * gn.astype(dtype)[:, None, None], axis=0)
            nrm = jnp.broadcast_to(gn.astype(dtype)[:, None, None], x.shape)
            v_rel = v_pt
        else:
            pb = s.prim_body
            bR = lanes.quat_to_mat(bquat[:, pb])               # (3, 3, B)
            d = x - bp[:, pb][:, None]
            xl = jnp.stack([bR[0, i][None] * d[0] + bR[1, i][None] * d[1]
                            + bR[2, i][None] * d[2] for i in range(3)])
            size = sizes[pb].astype(dtype)
            if s.gtype == GEOM_CUBOID:
                phi, gl = lanes._sdf_box(xl, (size / 2.0)[:, None, None])
            elif s.gtype == GEOM_CYLINDER:
                phi, gl = lanes._sdf_cylinder(xl, size[0], size[1])
            elif s.gtype == GEOM_SPHERE:
                phi, gl = lanes._sdf_sphere(xl, size[0])
            else:
                raise ValueError(s.gtype)
            nrm = jnp.stack([bR[i, 0][None] * gl[0] + bR[i, 1][None] * gl[1]
                             + bR[i, 2][None] * gl[2] for i in range(3)])
            v_prim = (lanes.cross(Om[:, s.prim_joint][:, None], x)
                      + be[:, s.prim_joint][:, None])
            v_rel = v_pt - v_prim
        prm = (prm_sel[:, None, None] if prm_sel.ndim == 1
               else prm_sel[:, None, :])
        f = lanes._penalty_force(phi, nrm, v_rel, prm)
        fs = jnp.sum(f, axis=1)
        ts = jnp.sum(lanes.cross(x, f), axis=1)
        F = F.at[:, s.joint].add(fs)
        Tau = Tau.at[:, s.joint].add(ts)
        if s.gtype != GROUND:
            pb = s.prim_body
            qp = bquat[:, pb][:, None]
            xi_p = jax.lax.stop_gradient(
                lanes.quat_rotate(lanes.quat_conj(qp),
                                  x - bp[:, pb][:, None]))
            x_app_p = bp[:, pb][:, None] + lanes.quat_rotate(qp, xi_p)
            F = F.at[:, s.prim_joint].add(-fs)
            Tau = Tau.at[:, s.prim_joint].add(
                -jnp.sum(lanes.cross(x_app_p, f), axis=1))
        if s.tac0 >= 0:
            tac = tac.at[:, s.tac0:s.tac0 + s.n].add(f)
    return F, Tau, tac[:, :ntac] if ntac else tac[:, :0]


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _kernel(segments, J, ntac_pad, batched_params, jp_ref, jq_ref, om_ref,
            be_ref, bp_ref, bq_ref, xix_ref, xiy_ref, xiz_ref, *rest):
    """One lane block. Refs: jp/om/be (3, J, Bb); jq (4, J, Bb);
    bp (3, NB, Bb); bq (4, NB, Bb); xi* (Npad, 1); scal SMEM (S+1, 8) rows
    [kn, kt, mu, damping, size0, size1, size2, 0] per segment, last row
    [gnx, gny, gnz, gn.gpos, 0...]; with ``batched_params`` an extra VMEM
    ref (4K, Bb) of per-lane [kn, kt, mu, damping] rows (contact-parameter
    domain randomization) replaces the scal param entries; outputs
    F/T (3, J, Bb), tac (3, ntac_pad, Bb)."""
    if batched_params:
        pp_ref, scal_ref, F_ref, T_ref, tac_ref = rest
    else:
        scal_ref, F_ref, T_ref, tac_ref = rest
    f32 = F_ref.dtype
    Bb = F_ref.shape[-1]
    F_ref[:, :, :] = jnp.zeros((3, J, Bb), f32)
    T_ref[:, :, :] = jnp.zeros((3, J, Bb), f32)
    tac_ref[:, :, :] = jnp.zeros((3, ntac_pad, Bb), f32)
    S = len(segments)
    gn = [scal_ref[S, 0], scal_ref[S, 1], scal_ref[S, 2]]
    gdot = scal_ref[S, 3]

    for si, s in enumerate(segments):
        r0, npd = s.row0, s.n_pad
        shape = (npd, Bb)
        xi = [jnp.broadcast_to(r[r0:r0 + npd, :], shape)
              for r in (xix_ref, xiy_ref, xiz_ref)]
        j = s.joint
        qw = jq_ref[0, j:j + 1, :]
        qv = [jq_ref[1 + i, j:j + 1, :] for i in range(3)]
        # x = jp + xi + 2 w (qv x xi) + 2 qv x (qv x xi)
        t = _cross(qv, xi)
        u = _cross(qv, t)
        x = [jp_ref[i, j:j + 1, :] + xi[i] + 2.0 * (qw * t[i] + u[i])
             for i in range(3)]
        om_j = [om_ref[i, j:j + 1, :] for i in range(3)]
        be_j = [be_ref[i, j:j + 1, :] for i in range(3)]
        oxx = _cross(om_j, x)
        v_pt = [oxx[i] + be_j[i] for i in range(3)]

        if batched_params:
            pr = 4 * s.param_row
            kn, kt, mu, damping = (pp_ref[pr + k:pr + k + 1, :]
                                   for k in range(4))
        else:
            kn, kt, mu, damping = (scal_ref[si, 0], scal_ref[si, 1],
                                   scal_ref[si, 2], scal_ref[si, 3])
        if s.gtype == GROUND:
            phi = x[0] * gn[0] + x[1] * gn[1] + x[2] * gn[2] - gdot
            nrm = [jnp.broadcast_to(gn[i], shape) for i in range(3)]
            v_rel = v_pt
        else:
            pb = s.prim_body
            pw = bq_ref[0, pb:pb + 1, :]
            pv = [bq_ref[1 + i, pb:pb + 1, :] for i in range(3)]
            # R columns from quaternion: R e_i = e_i + 2 w (pv x e_i)
            #                                  + 2 pv x (pv x e_i)
            ww, xq, yq, zq = pw, pv[0], pv[1], pv[2]
            xx, yy, zz = xq * xq, yq * yq, zq * zq
            wx, wy, wz = ww * xq, ww * yq, ww * zq
            xy, xz, yz = xq * yq, xq * zq, yq * zq
            R = [[1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
                 [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
                 [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]]
            d = [x[i] - bp_ref[i, pb:pb + 1, :] for i in range(3)]
            xl = [R[0][i] * d[0] + R[1][i] * d[1] + R[2][i] * d[2]
                  for i in range(3)]
            size = [scal_ref[si, 4], scal_ref[si, 5], scal_ref[si, 6]]
            if s.gtype == GEOM_CUBOID:
                half = [size[i] * 0.5 for i in range(3)]
                dd = [jnp.abs(xl[i]) - half[i] for i in range(3)]
                dmax = jnp.maximum(jnp.maximum(dd[0], dd[1]), dd[2])
                outs = [jnp.maximum(dd[i], 0.0) for i in range(3)]
                out_norm = jnp.sqrt(outs[0] ** 2 + outs[1] ** 2
                                    + outs[2] ** 2 + _EPS ** 2)
                phi = jnp.where(dmax > 0, out_norm, dmax)
                hit = [(dd[i] == dmax).astype(f32) for i in range(3)]
                hit_sum = hit[0] + hit[1] + hit[2]
                gl = [jnp.where(dmax > 0, outs[i] / out_norm,
                                hit[i] / hit_sum) * jnp.sign(xl[i])
                      for i in range(3)]
            elif s.gtype == GEOM_CYLINDER:
                r2 = jnp.sqrt(xl[0] ** 2 + xl[1] ** 2 + _EPS ** 2)
                dr = r2 - size[0]
                dz = jnp.abs(xl[2]) - size[1]
                dmax = jnp.maximum(dr, dz)
                o_r = jnp.maximum(dr, 0.0)
                o_z = jnp.maximum(dz, 0.0)
                out_norm = jnp.sqrt(o_r ** 2 + o_z ** 2 + _EPS ** 2)
                phi = jnp.where(dmax > 0, out_norm, dmax)
                pick_r = (dr >= dz).astype(f32)
                c_r = jnp.where(dmax > 0, o_r / out_norm, pick_r)
                c_z = jnp.where(dmax > 0, o_z / out_norm, 1.0 - pick_r)
                gl = [c_r * xl[0] / r2, c_r * xl[1] / r2,
                      c_z * jnp.sign(xl[2])]
            else:  # GEOM_SPHERE
                r = jnp.sqrt(xl[0] ** 2 + xl[1] ** 2 + xl[2] ** 2
                             + _EPS ** 2)
                phi = r - size[0]
                gl = [xl[i] / r for i in range(3)]
            nrm = [R[i][0] * gl[0] + R[i][1] * gl[1] + R[i][2] * gl[2]
                   for i in range(3)]
            pj = s.prim_joint
            om_p = [om_ref[i, pj:pj + 1, :] for i in range(3)]
            be_p = [be_ref[i, pj:pj + 1, :] for i in range(3)]
            oxp = _cross(om_p, x)
            v_rel = [v_pt[i] - oxp[i] - be_p[i] for i in range(3)]

        pen = jnp.maximum(-phi, 0.0)
        vn = v_rel[0] * nrm[0] + v_rel[1] * nrm[1] + v_rel[2] * nrm[2]
        pdot = jnp.maximum(-vn, 0.0)
        fn_mag = kn * pen + damping * pen * pdot
        vt = [v_rel[i] - vn * nrm[i] for i in range(3)]
        vt_norm = jnp.sqrt(vt[0] ** 2 + vt[1] ** 2 + vt[2] ** 2 + _EPS ** 2)
        cap = mu * fn_mag
        scale = cap / jnp.maximum(cap, kt * vt_norm + _EPS)
        # explicit pad-row mask: padded rows hold a 1e6 local-coordinate
        # sentinel which is force-free for primitive SDFs but NOT guaranteed
        # for the infinite GROUND plane under a non-yaw owner orientation
        # (advisor r04) — zero them unconditionally instead
        if s.n < npd:
            valid = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                     < s.n).astype(f32)
        else:
            valid = 1.0
        f = [(fn_mag * nrm[i] - (kt * scale) * vt[i]) * valid
             for i in range(3)]
        xf = _cross(x, f)
        for i in range(3):
            fs = jnp.sum(f[i], axis=0, keepdims=True)
            ts = jnp.sum(xf[i], axis=0, keepdims=True)
            F_ref[i, j:j + 1, :] += fs
            T_ref[i, j:j + 1, :] += ts
            if s.gtype != GROUND:
                pj = s.prim_joint
                F_ref[i, pj:pj + 1, :] += -fs
                T_ref[i, pj:pj + 1, :] += -ts
            if s.tac0 >= 0:
                tac_ref[i, s.tac0:s.tac0 + npd, :] += f[i]


def make_pair_wrenches(struct, interpret=None):
    """Build the fused pair-wrench op for a scene.

    Returns (fn, has_segments): fn(jp, jq, Om, be, bp, bquat, sizes, params,
    gpos, gn, xi_packed) -> (F (3,J,B), Tau (3,J,B), tac (3,ntac,B)),
    custom_vjp'd (backward = jnp twin). Pass the COMBINED local point table
    xi_packed built with ``pack_points``.
    """
    segments, n_rows, src_idx, packed_rows = build_segments(struct)
    J = struct.njoints
    NB = struct.nbodies
    ntac = len(struct.tac_joint)
    ntac_pad = ((ntac + 8 + 7) // 8) * 8
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not segments:
        return None, (segments, n_rows, src_idx, packed_rows)

    def run_kernel(jp, jq, Om, be, bp, bquat, sizes, params, gpos, gn,
                   xi_packed):
        dtype = jnp.float32
        B = jp.shape[-1]
        Bb = _LANE_BLOCK
        Bpad = ((B + Bb - 1) // Bb) * Bb
        batched_params = params.ndim == 3          # (K, 4, B) per-lane DR
        kernel = functools.partial(_kernel, segments, J, ntac_pad,
                                   batched_params)
        def padB(a):
            a = a.astype(dtype)
            if a.shape[-1] != Bpad:
                a = jnp.pad(a, [(0, 0)] * (a.ndim - 1)
                            + [(0, Bpad - a.shape[-1])])
            return a
        jp_, om_, be_ = padB(jp), padB(Om), padB(be)
        jq_, bp_, bq_ = padB(jq), padB(bp), padB(bquat)
        xi = jnp.full((n_rows, 3), 1e6, dtype)
        xi = xi.at[packed_rows].set(xi_packed.astype(dtype))
        # per-segment scalar rows + ground row
        rows = []
        for s in segments:
            prm = (jnp.zeros(4, dtype) if batched_params
                   else params[s.param_row].astype(dtype))
            size = (sizes[s.prim_body].astype(dtype) if s.prim_body >= 0
                    else jnp.zeros(3, dtype))
            rows.append(jnp.concatenate([prm, size, jnp.zeros(1, dtype)]))
        rows.append(jnp.concatenate([
            gn.astype(dtype), jnp.sum(gn * gpos).astype(dtype)[None],
            jnp.zeros(4, dtype)]))
        scal = jnp.stack(rows)

        grid = (Bpad // Bb,)
        vspec = lambda d0, d1: pl.BlockSpec((d0, d1, Bb),
                                            lambda b: (0, 0, b),
                                            memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((n_rows, 1), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        in_specs = [vspec(3, J), vspec(4, J), vspec(3, J), vspec(3, J),
                    vspec(3, NB), vspec(4, NB), xspec, xspec, xspec]
        inputs = [jp_, jq_, om_, be_, bp_, bq_,
                  xi[:, 0:1], xi[:, 1:2], xi[:, 2:3]]
        if batched_params:
            K = params.shape[0]
            pp = padB(params).reshape(4 * K, Bpad)      # row 4k+j
            in_specs.append(pl.BlockSpec((4 * K, Bb), lambda b: (0, b),
                                         memory_space=pltpu.VMEM))
            inputs.append(pp)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(scal)
        F, T, tac = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=(
                jax.ShapeDtypeStruct((3, J, Bpad), dtype),
                jax.ShapeDtypeStruct((3, J, Bpad), dtype),
                jax.ShapeDtypeStruct((3, ntac_pad, Bpad), dtype),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((3, J, Bb), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, J, Bb), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, ntac_pad, Bb), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(*inputs)
        out_dtype = jp.dtype
        return (F[:, :, :B].astype(out_dtype), T[:, :, :B].astype(out_dtype),
                tac[:, :ntac, :B].astype(out_dtype))

    @jax.custom_vjp
    def pair_wrenches(jp, jq, Om, be, bp, bquat, sizes, params, gpos, gn,
                      xi_packed):
        return run_kernel(jp, jq, Om, be, bp, bquat, sizes, params, gpos,
                          gn, xi_packed)

    def ref_fn(jp, jq, Om, be, bp, bquat, sizes, params, gpos, gn,
               xi_packed):
        xi_rows = jnp.zeros((n_rows, 3), xi_packed.dtype).at[
            packed_rows].set(xi_packed)
        return _wrenches_ref(segments, J, ntac, jp, jq, Om, be, bp, bquat,
                             sizes, params, gpos, gn, xi_rows)

    def fwd(*args):
        return run_kernel(*args), args

    def bwd(args, g):
        _, pullback = jax.vjp(ref_fn, *args)
        return pullback(g)

    pair_wrenches.defvjp(fwd, bwd)
    pair_wrenches.reference = ref_fn
    return pair_wrenches, (segments, n_rows, src_idx, packed_rows)


def pack_points(struct, model, src_idx):
    """Gather the combined [cp_pos; tac_pos] rows for the kernel point table
    (differentiable — design-parameter gradients flow back to the model)."""
    ncp = len(struct.cp_joint)
    both = [model.cp_pos, model.tac_pos]
    if ncp == 0:
        all_pts = model.tac_pos
    elif len(struct.tac_joint) == 0:
        all_pts = model.cp_pos
    else:
        all_pts = jnp.concatenate(both, axis=0)
    return all_pts[src_idx]
