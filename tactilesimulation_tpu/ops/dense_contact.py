"""Fused dense point-vs-primitive penalty-contact Pallas kernel.

The tactile scenes put thousands of sensor markers against one primitive —
the RollingBall benchmark pad is 200x200 = 40k markers vs one sphere
(reference test_sim_speed.py, SURVEY.md §3.4/C5/C6). In plain XLA the contact
pipeline works on (N, 3)-shaped arrays whose minor dimension occupies 3 of the
128 VPU lanes (~2% utilization). This kernel transposes the problem to the
TPU-native layout — points in the LANE dimension, coordinates in sublanes —
and fuses the whole force law (world->local transform, SDF, relative
velocity, nonlinear Kelvin-Voigt normal force, smooth Coulomb-capped
friction; contact.py:penalty_force) into a single VMEM-resident kernel: ~50
vector ops at full lane utilization instead of ~50 padded XLA ops + fusion
boundaries.

Scope (v1): one primitive body (or the ground half-space) against N points,
forward evaluation. This covers the dense tactile *query* path
(``get_tactile_force_vector``, flow images, the FPS benchmark). The
integrator-residual path keeps the jnp formulation (it is linearized and
transposed by the IFT solver; a primitive with hand-written JVP/transpose
kernels is the planned follow-up).

Numerics match ``contact.group_forces`` for a single-primitive group to float
round-off; tests pin the kernel against that oracle (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..model.schema import GEOM_CUBOID, GEOM_CYLINDER, GEOM_SPHERE
from ..sim.contact import GROUND

_EPS = 1e-9           # keep identical to contact._EPS
_LANES = 128


def _interpret_default():
    return jax.default_backend() != "tpu"


def _kernel(gtype, x_ref, xd_ref, scal_ref, out_ref):
    """Rows of x_ref/xd_ref/out_ref: 3 coordinates; lanes: points.

    scal_ref (SMEM, (1, 32)): [p(3), R(9 row-major), v(3), w(3), size(3),
    kn, kt, mu, damping, gn(3), gp(1)] — gn/gp are the ground normal and
    plane offset (gn . ground_pos), used only for gtype == GROUND.
    """
    f32 = out_ref.dtype

    def s(i):
        return scal_ref[0, i]

    x = [x_ref[i, :] for i in range(3)]          # world points, (N,) each
    xd = [xd_ref[i, :] for i in range(3)]
    p = [s(0), s(1), s(2)]
    R = [[s(3 + 3 * i + j) for j in range(3)] for i in range(3)]
    v = [s(12), s(13), s(14)]
    w = [s(15), s(16), s(17)]
    size = [s(18), s(19), s(20)]
    kn, kt, mu, damping = s(21), s(22), s(23), s(24)

    d = [x[i] - p[i] for i in range(3)]          # world offset from primitive

    if gtype == GROUND:
        gn = [s(25), s(26), s(27)]
        phi = x[0] * gn[0] + x[1] * gn[1] + x[2] * gn[2] - s(28)
        n = [jnp.broadcast_to(gn[i], phi.shape) for i in range(3)]
        v_rel = xd
    else:
        # world -> local: xl = R^T d
        xl = [R[0][i] * d[0] + R[1][i] * d[1] + R[2][i] * d[2]
              for i in range(3)]
        if gtype == GEOM_SPHERE:
            r = jnp.sqrt(xl[0] ** 2 + xl[1] ** 2 + xl[2] ** 2 + _EPS ** 2)
            phi = r - size[0]
            gl = [xl[i] / r for i in range(3)]
        elif gtype == GEOM_CUBOID:
            half = [size[i] * 0.5 for i in range(3)]
            dd = [jnp.abs(xl[i]) - half[i] for i in range(3)]
            dmax = jnp.maximum(jnp.maximum(dd[0], dd[1]), dd[2])
            outs = [jnp.maximum(dd[i], 0.0) for i in range(3)]
            out_norm = jnp.sqrt(outs[0] ** 2 + outs[1] ** 2 + outs[2] ** 2
                                + _EPS ** 2)
            phi = jnp.where(dmax > 0, out_norm, dmax)
            hit = [(dd[i] == dmax).astype(f32) for i in range(3)]
            hit_sum = hit[0] + hit[1] + hit[2]
            gl = [jnp.where(dmax > 0, outs[i] / out_norm,
                            hit[i] / hit_sum) * jnp.sign(xl[i])
                  for i in range(3)]
        elif gtype == GEOM_CYLINDER:
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
        else:
            raise ValueError(gtype)
        # local -> world normal: n = R gl
        n = [R[i][0] * gl[0] + R[i][1] * gl[1] + R[i][2] * gl[2]
             for i in range(3)]
        # primitive surface velocity at x: v + w x d
        v_prim = [v[0] + w[1] * d[2] - w[2] * d[1],
                  v[1] + w[2] * d[0] - w[0] * d[2],
                  v[2] + w[0] * d[1] - w[1] * d[0]]
        v_rel = [xd[i] - v_prim[i] for i in range(3)]

    pen = jnp.maximum(-phi, 0.0)
    vn = v_rel[0] * n[0] + v_rel[1] * n[1] + v_rel[2] * n[2]
    pdot = jnp.maximum(-vn, 0.0)
    fn_mag = kn * pen + damping * pen * pdot
    vt = [v_rel[i] - vn * n[i] for i in range(3)]
    vt_norm = jnp.sqrt(vt[0] ** 2 + vt[1] ** 2 + vt[2] ** 2 + _EPS ** 2)
    cap = mu * fn_mag
    scale = cap / jnp.maximum(cap, kt * vt_norm + _EPS)
    for i in range(3):
        out_ref[i, :] = fn_mag * n[i] - (kt * scale) * vt[i]


def _pack_scalars(prim_pos, prim_R, prim_v, prim_w, size, params,
                  ground_normal, ground_pos, dtype):
    gn = ground_normal
    flat = jnp.concatenate([
        prim_pos.reshape(3), prim_R.reshape(9), prim_v.reshape(3),
        prim_w.reshape(3), size.reshape(3), params.reshape(4),
        gn.reshape(3), jnp.sum(gn * ground_pos).reshape(1),
        jnp.zeros(3, dtype)]).astype(dtype)
    return flat.reshape(1, 32)


@functools.partial(jax.jit, static_argnums=(0, 8))
def dense_point_contact(gtype, x, xdot, prim_pose, prim_vel, size, params,
                        ground, interpret=None):
    """Contact force on N points from one primitive (or the ground).

    Args:
      gtype: GROUND or GEOM_{CUBOID,CYLINDER,SPHERE} (static).
      x, xdot: (N, 3) world point positions / velocities.
      prim_pose: (p (3,), R (3, 3)) world pose of the primitive body.
      prim_vel: (v (3,), w (3,)) linear/angular world velocity.
      size: (3,) primitive size row (body_size semantics).
      params: (4,) [kn, kt, mu, damping].
      ground: (ground_pos (3,), ground_normal (3,)).
      interpret: force interpreter mode (default: auto, True off-TPU).

    Returns:
      f: (N, 3) world-frame force on each point.
    """
    if interpret is None:
        interpret = _interpret_default()
    n_pts = x.shape[0]
    dtype = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    n_pad = max(_LANES, ((n_pts + _LANES - 1) // _LANES) * _LANES)
    xt = jnp.zeros((3, n_pad), dtype).at[:, :n_pts].set(x.T.astype(dtype))
    # pad far above the ground/primitive so padding lanes produce zero force
    xt = xt.at[:, n_pts:].set(1e6)
    xdt = jnp.zeros((3, n_pad), dtype).at[:, :n_pts].set(xdot.T.astype(dtype))
    scal = _pack_scalars(prim_pose[0], prim_pose[1], prim_vel[0], prim_vel[1],
                         size, params, ground[1], ground[0], dtype)

    from jax.experimental.pallas import tpu as pltpu
    f_t = pl.pallas_call(
        functools.partial(_kernel, int(gtype)),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, xdt, scal)
    return f_t[:, :n_pts].T.astype(x.dtype)
