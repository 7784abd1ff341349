"""Single-instance contact in points-major (3, N) layout — the dense-field
differentiable hot path.

The single-instance core (dynamics.py) keeps contact points as (N, 3) rows:
3 of 128 VPU lanes used, which is why the 40k-marker rolling-ball BPTT took
19.4 s / 100 steps in round 3 (artifacts/ROLLING_FPS_r03.json) while the
forward query (Pallas kernel, points in lanes) flies. This module evaluates
the SAME contact semantics with points in the LAST axis — (3, N) arrays, N in
lanes — reusing the component-first helpers and the segment tables of the
batched lane core, so both the forward rollout AND its reverse-mode BPTT are
lane-efficient without a hand-written backward kernel.

Used by ``integrators.build_step(..., points_major=True)`` (auto-selected by
``Simulator`` for scenes with dense marker fields) and by the rolling-ball
benchmark. Parity with ``dynamics.contact_terms`` is pinned to round-off in
tests/test_dense_single.py.

Reference: this is the TPU replacement for the C++ adjoint's dense-tactile
backward (SURVEY.md C7; /root/reference/envs/redmax_torch_functions.py:70-109
seeds df_dtactile through the 200x200-pad scene tactile_pad.xml).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import contact, lanes
from .types import Model, Structure


def _segments(struct: Structure):
    from ..ops import lane_contact
    return lane_contact.build_segments(struct)


def contact_terms_points_major(struct: Structure, model: Model, q, v):
    """(Q (n,), tac_sensor_frame forces via tactile_field) — single instance.

    Returns (Q (n,), tac_force_world (ntac, 3)).
    """
    from ..ops import lane_contact
    segments, n_rows, src_idx, packed_rows = _segments(struct)
    dtype = q.dtype
    ntac = len(struct.tac_joint)
    groups = struct.contact_groups
    if not groups:
        return jnp.zeros_like(q), jnp.zeros((ntac, 3), dtype)

    q1, v1 = q[:, None], v[:, None]
    jp, jq, bp, bquat, w, c, rot_mask, Omega, beta = \
        lanes._fused_small_stage(struct, model, q1, v1)
    J = struct.njoints
    params = contact.combined_params(model).astype(dtype)
    xi_sel = lane_contact.pack_points(struct, model, src_idx).astype(dtype)

    F = jnp.zeros((3, J), dtype)
    Tau = jnp.zeros((3, J), dtype)
    tac = jnp.zeros((3, max(ntac, 1)), dtype)

    offset = 0
    for s in segments:
        xi = xi_sel[offset:offset + s.n].T            # (3, n) points in lanes
        offset += s.n
        j = s.joint
        jq_j = jq[:, j]                               # (4, 1)
        x = jp[:, j] + lanes.quat_rotate(jq_j, xi)    # (3, n)
        v_pt = lanes.cross(Omega[:, j], x) + beta[:, j]
        if s.gtype == contact.GROUND:
            gn = jnp.asarray(model.ground_normal, dtype)[:, None]
            gp = jnp.asarray(model.ground_pos, dtype)[:, None]
            phi = jnp.sum((x - gp) * gn, axis=0)
            nrm = jnp.broadcast_to(gn, x.shape)
            v_rel = v_pt
        else:
            pb = s.prim_body
            bR = lanes.quat_to_mat(bquat[:, pb])      # (3, 3, 1)
            d = x - bp[:, pb]
            xl = lanes.mat_tvec(bR, d)
            size = jnp.asarray(model.body_size, dtype)[pb][:, None]
            if s.gtype == contact.GEOM_CUBOID:
                phi, gl = lanes._sdf_box(xl, size / 2.0)
            elif s.gtype == contact.GEOM_CYLINDER:
                phi, gl = lanes._sdf_cylinder(xl, size[0], size[1])
            elif s.gtype == contact.GEOM_SPHERE:
                phi, gl = lanes._sdf_sphere(xl, size[0])
            else:
                raise ValueError(s.gtype)
            nrm = lanes.mat_vec(bR, gl)
            v_prim = lanes.cross(Omega[:, s.prim_joint], x) \
                + beta[:, s.prim_joint]
            v_rel = v_pt - v_prim
        prm = params[s.param_row][:, None]
        f = lanes._penalty_force(phi, nrm, v_rel, prm)

        fs = jnp.sum(f, axis=1)
        ts = jnp.sum(lanes.cross(x, f), axis=1)
        F = F.at[:, j].add(fs)
        Tau = Tau.at[:, j].add(ts)
        if s.gtype != contact.GROUND:
            pb = s.prim_body
            qp = bquat[:, pb]
            xi_p = jax.lax.stop_gradient(
                lanes.quat_rotate(lanes.quat_conj(qp), x - bp[:, pb]))
            x_app_p = bp[:, pb] + lanes.quat_rotate(qp, xi_p)
            F = F.at[:, s.prim_joint].add(-fs)
            Tau = Tau.at[:, s.prim_joint].add(
                -jnp.sum(lanes.cross(x_app_p, f), axis=1))
        if s.tac0 >= 0:
            tac = tac.at[:, s.tac0:s.tac0 + s.n].add(f)

    # sphere_general groups (analytic sphere centers — a handful of points)
    sphere_groups = [g for g in groups if g.sphere_general]
    if sphere_groups:
        bR_all = lanes.quat_to_mat(bquat)
        F1, Tau1 = F[:, :, None], Tau[:, :, None]
        for g in sphere_groups:
            F1, Tau1 = lanes._sphere_group_wrenches(
                struct, model, g, bp, bquat, bR_all, Omega, beta, params,
                F1, Tau1)
        F, Tau = F1[:, :, 0], Tau1[:, :, 0]

    Q = lanes.wrench_to_Q(struct, w, c, rot_mask,
                          F[:, :, None], Tau[:, :, None])[:, 0]
    return Q, (tac[:, :ntac].T if ntac else jnp.zeros((0, 3), dtype))


def tactile_field_points_major(struct: Structure, model: Model, q, v):
    """(Mtot, 3) sensor-frame [shear0, shear1, normal] marker forces —
    drop-in for dynamics.tactile_field with lane-efficient layout."""
    from . import kinematics, spatial
    _, tac_force = contact_terms_points_major(struct, model, q, v)
    n_w, a0_w, a1_w = kinematics.tactile_frames_world(struct, model, q)
    return jnp.stack(
        [jnp.sum(tac_force * a0_w, axis=-1),
         jnp.sum(tac_force * a1_w, axis=-1),
         jnp.sum(tac_force * n_w, axis=-1)], axis=-1)


def applied_forces_points_major(struct: Structure, model: Model, q, v, u):
    from . import dynamics
    Q_contact, tac_force = contact_terms_points_major(struct, model, q, v)
    Q = (dynamics.joint_spring_forces(model, q, v)
         + dynamics.motor_forces(struct, model, q, v, u)
         + Q_contact)
    return Q, tac_force
