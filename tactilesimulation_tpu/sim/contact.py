"""Penalty contact + dense tactile force fields (grouped, fully vectorized).

Replaces the reference C++ contact engine (SURVEY.md C5) and tactile sensor
module (C6). All declared contact pairs and tactile sensors are flattened at
model-compile time into *contact instances* grouped by primitive geometry
(ground / cuboid / cylinder / sphere), so the runtime evaluates a handful of
big dense blocks regardless of how many pairs a scene declares (stable_grasp
declares 55 pairs + 22 tactile pairs; here that is ~4 vectorized blocks).
This is the TPU-first formulation: wide arrays, gathers with static indices,
segment-sums — no per-pair unrolled graphs.

Force law (smooth everywhere — the BPTT path differentiates through it):

    p      = max(0, -phi)                      penetration depth
    pdot   = max(0, -d(phi)/dt)                penetration rate
    f_n    = (kn * p + damping * p * pdot) n   nonlinear Kelvin-Voigt normal
    f_t    = -kt * v_t * mu|f_n| / max(mu|f_n|, kt|v_t| + eps)
                                               viscous friction, smooth
                                               Coulomb cap at mu |f_n|

The exact DiffRedMax force law is unrecoverable (empty submodule); this model
keeps its parameterization and runtime-update surface (C9's
update_contact_parameters / update_tactile_parameters).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model.schema import GEOM_CUBOID, GEOM_CYLINDER, GEOM_SPHERE

_EPS = 1e-9
GROUND = -1


@dataclasses.dataclass(frozen=True, eq=False)
class ContactGroup:
    """A batch of contact instances sharing one primitive geometry type.

    Index arrays are host numpy (static); ``point_idx`` indexes the combined
    world-point array [contact points; tactile markers]. ``sphere_general``
    marks groups whose "points" are sphere body centers (analytic sphere
    contact, e.g. the rolling ball on the ground)."""
    gtype: int                       # GROUND or GEOM_* of the primitive side
    point_idx: np.ndarray            # (Ni,) into combined points, or body idx
    general_body: np.ndarray         # (Ni,)
    prim_body: np.ndarray            # (Ni,) (ignored for GROUND)
    param_idx: np.ndarray            # (Ni,) into combined [pair; tactile] params
    tac_row: np.ndarray              # (Ni,) marker row or -1
    sphere_general: bool = False


def _sdf_box(xl, half):
    d = jnp.abs(xl) - half
    dmax = jnp.max(d, axis=-1, keepdims=True)
    outside = jnp.maximum(d, 0.0)
    out_norm = jnp.sqrt(jnp.sum(outside**2, axis=-1, keepdims=True) + _EPS**2)
    phi = jnp.where(dmax[..., 0] > 0, out_norm[..., 0], dmax[..., 0])
    g_out = outside / out_norm * jnp.sign(xl)
    inside_axis = (d == dmax).astype(xl.dtype)
    inside_axis = inside_axis / jnp.sum(inside_axis, axis=-1, keepdims=True)
    g_in = inside_axis * jnp.sign(xl)
    g = jnp.where(dmax > 0, g_out, g_in)
    return phi, g


def _sdf_cylinder(xl, radius, half_len):
    r2 = jnp.sqrt(xl[..., 0] ** 2 + xl[..., 1] ** 2 + _EPS**2)
    dr = r2 - radius
    dz = jnp.abs(xl[..., 2]) - half_len
    d = jnp.stack([dr, dz], axis=-1)
    dmax = jnp.max(d, axis=-1)
    outside = jnp.maximum(d, 0.0)
    out_norm = jnp.sqrt(jnp.sum(outside**2, axis=-1) + _EPS**2)
    phi = jnp.where(dmax > 0, out_norm, dmax)
    g2_out = outside / out_norm[..., None]
    pick_r = (dr >= dz).astype(xl.dtype)
    g2_in = jnp.stack([pick_r, 1.0 - pick_r], axis=-1)
    g2 = jnp.where(dmax[..., None] > 0, g2_out, g2_in)
    radial = jnp.stack([xl[..., 0] / r2, xl[..., 1] / r2], axis=-1)
    g = jnp.concatenate(
        [g2[..., 0:1] * radial, (g2[..., 1] * jnp.sign(xl[..., 2]))[..., None]],
        axis=-1)
    return phi, g


def _sdf_sphere(xl, radius):
    r = jnp.sqrt(jnp.sum(xl**2, axis=-1) + _EPS**2)
    return r - radius, xl / r[..., None]


def group_sdf(group: ContactGroup, model, x, body_p, body_R):
    """SDF value + world outward normal of the group's primitives at x (Ni,3)."""
    if group.gtype == GROUND:
        n = model.ground_normal.astype(x.dtype)
        phi = (x - model.ground_pos) @ n
        return phi, jnp.broadcast_to(n, x.shape)
    pidx = jnp.asarray(group.prim_body)
    p_b = jnp.take(body_p, pidx, axis=0)
    R_b = jnp.take(body_R, pidx, axis=0)
    size = jnp.take(model.body_size, pidx, axis=0)
    xl = jnp.einsum("nji,nj->ni", R_b, x - p_b,
                    precision=jax.lax.Precision.HIGHEST)  # world -> local
    if group.gtype == GEOM_CUBOID:
        phi, gl = _sdf_box(xl, size / 2.0)
    elif group.gtype == GEOM_CYLINDER:
        phi, gl = _sdf_cylinder(xl, size[:, 0], size[:, 1])
    elif group.gtype == GEOM_SPHERE:
        phi, gl = _sdf_sphere(xl, size[:, 0])
    else:
        raise ValueError(group.gtype)
    n = jnp.einsum("nij,nj->ni", R_b, gl,
                    precision=jax.lax.Precision.HIGHEST)
    return phi, n


def penalty_force(phi, n, v_rel, kn, kt, mu, damping):
    """Per-point contact force on the penetrating point (world frame)."""
    p = jnp.maximum(-phi, 0.0)
    pdot = jnp.maximum(-jnp.sum(n * v_rel, axis=-1), 0.0)
    fn_mag = kn * p + damping * p * pdot
    fn = fn_mag[..., None] * n
    vt = v_rel - jnp.sum(v_rel * n, axis=-1, keepdims=True) * n
    vt_norm = jnp.sqrt(jnp.sum(vt**2, axis=-1) + _EPS**2)
    cap = mu * fn_mag
    scale = cap / jnp.maximum(cap, kt * vt_norm + _EPS)
    ft = -(kt * scale)[..., None] * vt
    return fn + ft


def combined_params(model):
    """(K+S, 4) rows of [kn, kt, mu, damping]: declared pairs then sensors.

    Leaves may carry a trailing per-lane batch axis ((K, B) / (S, B) —
    per-episode contact-parameter domain randomization, e.g. TactileInsertion
    reference :238-281); the result is then (K+S, 4, B)."""
    ax = 1 if model.pair_kn.ndim == 2 else -1
    pair = jnp.stack(
        [model.pair_kn, model.pair_kt, model.pair_mu, model.pair_damping],
        axis=ax)
    tac = jnp.stack(
        [model.tac_kn, model.tac_kt, model.tac_mu, model.tac_damping], axis=ax)
    return jnp.concatenate([pair, tac], axis=0)


def group_forces(group: ContactGroup, model, pts, pts_dot, body_p, body_R,
                 body_v, body_w, params):
    """Evaluate one instance group.

    Returns (f (Ni,3) world force on the general side, x_eff (Ni,3)
    application points, xi_p (Ni,3) primitive-side material coords).
    """
    gi = jnp.asarray(group.general_body)
    if group.sphere_general:
        x = jnp.take(body_p, jnp.asarray(group.point_idx), axis=0)
    else:
        x = jnp.take(pts, jnp.asarray(group.point_idx), axis=0)
    phi, n = group_sdf(group, model, x, body_p, body_R)

    if group.sphere_general:
        r = jnp.take(model.body_size[:, 0], gi)
        phi = phi - r
        x_eff = x - r[:, None] * n
        v_pt = (jnp.take(body_v, gi, axis=0)
                + jnp.cross(jnp.take(body_w, gi, axis=0), x_eff - x))
    else:
        x_eff = x
        v_pt = jnp.take(pts_dot, jnp.asarray(group.point_idx), axis=0)

    if group.gtype == GROUND:
        v_prim = jnp.zeros_like(x_eff)
        xi_p = jnp.zeros_like(x_eff)
    else:
        pidx = jnp.asarray(group.prim_body)
        p_b = jnp.take(body_p, pidx, axis=0)
        R_b = jnp.take(body_R, pidx, axis=0)
        v_prim = (jnp.take(body_v, pidx, axis=0)
                  + jnp.cross(jnp.take(body_w, pidx, axis=0), x_eff - p_b))
        xi_p = jnp.einsum("nji,nj->ni", R_b, x_eff - p_b,
                           precision=jax.lax.Precision.HIGHEST)

    prm = jnp.take(params, jnp.asarray(group.param_idx), axis=0)
    f = penalty_force(phi, n, v_pt - v_prim,
                      prm[:, 0], prm[:, 1], prm[:, 2], prm[:, 3])
    return f, x_eff, xi_p


def build_groups(struct) -> Tuple[ContactGroup, ...]:
    """Flatten struct.pairs + struct.tactile_pairs into instance groups,
    bucketed by primitive geometry. Called by the builder."""
    ncp = len(struct.cp_joint)
    nparams = len(struct.pairs)
    buckets = {}

    def add(gtype, sphere_general, point_idx, general_body, prim_body,
            param_idx, tac_row):
        key = (gtype, sphere_general)
        b = buckets.setdefault(key, [[], [], [], [], []])
        n = len(point_idx)
        b[0].append(np.asarray(point_idx))
        b[1].append(np.full(n, general_body))
        b[2].append(np.full(n, prim_body))
        b[3].append(np.full(n, param_idx))
        b[4].append(np.asarray(tac_row))

    def pair_gtype(pair):
        return GROUND if pair.primitive_body < 0 else struct.body_gtype[pair.primitive_body]

    for pair in struct.pairs:
        g = pair_gtype(pair)
        if pair.general_is_sphere:
            add(g, True, [pair.general_body], pair.general_body,
                max(pair.primitive_body, 0), pair.param_index, [-1])
        else:
            idx = np.arange(pair.point_start, pair.point_start + pair.point_count)
            add(g, False, idx, pair.general_body,
                max(pair.primitive_body, 0), pair.param_index,
                np.full(pair.point_count, -1))
    for pair in struct.tactile_pairs:
        g = pair_gtype(pair)
        # tactile markers live after contact points in the combined array
        rows = np.arange(pair.point_start, pair.point_start + pair.point_count)
        add(g, False, ncp + rows, pair.general_body,
            max(pair.primitive_body, 0), nparams + pair.param_index, rows)

    groups = []
    for (gtype, sphere_general), b in sorted(buckets.items(),
                                             key=lambda kv: (kv[0][0], kv[0][1])):
        groups.append(ContactGroup(
            gtype=gtype,
            point_idx=np.concatenate(b[0]).astype(np.int32),
            general_body=np.concatenate(b[1]).astype(np.int32),
            prim_body=np.concatenate(b[2]).astype(np.int32),
            param_idx=np.concatenate(b[3]).astype(np.int32),
            tac_row=np.concatenate(b[4]).astype(np.int32),
            sphere_general=sphere_general,
        ))
    return tuple(groups)
