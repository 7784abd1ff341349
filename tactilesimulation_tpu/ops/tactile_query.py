"""Fast dense tactile field query built on the fused contact kernel.

The reference queries ``get_tactile_force_vector()`` after stepping
(test_sim_speed.py:80, redmax_torch_functions.py:57); the query needs marker
forces only — not the generalized contact force — so it can skip the whole
J^T f projection machinery in ``dynamics.contact_terms``. This path computes
marker world positions/velocities + primitive body poses with ONE jvp over
FK, then evaluates each tactile pair with ``ops.dense_contact`` (points in
lanes, fused force law).

Used by the host facade and the FPS benchmark. The differentiable env paths
keep the jnp formulation (gradients flow through tactile observations in
BPTT); parity between the two is pinned by tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim import kinematics, spatial
from ..sim.contact import GROUND
from .dense_contact import dense_point_contact


def supported(struct) -> bool:
    """True if every tactile pair is point-vs-{ground,primitive}."""
    from ..model.schema import GEOM_CUBOID, GEOM_CYLINDER, GEOM_SPHERE
    ok = (GEOM_CUBOID, GEOM_CYLINDER, GEOM_SPHERE)
    for pair in struct.tactile_pairs:
        if pair.general_is_sphere:
            return False
        if pair.primitive_body >= 0 and \
                struct.body_gtype[pair.primitive_body] not in ok:
            return False
    return len(struct.tactile_pairs) > 0


def tactile_field(struct, model, q, v, interpret=None):
    """(Mtot, 3) sensor-frame [shear0, shear1, normal] marker forces.

    Drop-in for ``dynamics.tactile_field`` on the no-grad query path.
    """
    ntac = len(struct.tac_joint)
    dtype = q.dtype
    if ntac == 0:
        return jnp.zeros((0, 3), dtype)

    def fk(qq):
        jp, jq = kinematics.fk_joints(struct, model, qq)
        idx = jnp.asarray(struct.tac_joint)
        x = spatial.transform_apply(jnp.take(jp, idx, axis=0),
                                    jnp.take(jq, idx, axis=0), model.tac_pos)
        bp, bquat = kinematics.fk_bodies(struct, model, qq)
        return x, bp, bquat, jnp.take(jq, idx, axis=0)

    (x, bp, bquat, tq), (xd, bv, bquatd, _) = jax.jvp(fk, (q,), (v,))
    bw = 2.0 * spatial.quat_mul(bquatd, spatial.quat_conj(bquat))[..., 1:]
    bR = spatial.quat_to_mat(bquat)

    tac_params = jnp.stack([model.tac_kn, model.tac_kt, model.tac_mu,
                            model.tac_damping], axis=-1).astype(dtype)
    ground = (model.ground_pos.astype(dtype),
              model.ground_normal.astype(dtype))
    zero3 = jnp.zeros(3, dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    tac_force = jnp.zeros((ntac, 3), dtype)
    for pair in struct.tactile_pairs:
        sl = slice(pair.point_start, pair.point_start + pair.point_count)
        if pair.primitive_body < 0:
            gtype, pose, vel, size = GROUND, (zero3, eye3), (zero3, zero3), \
                jnp.ones(3, dtype)
        else:
            b = pair.primitive_body
            gtype = struct.body_gtype[b]
            pose = (bp[b], bR[b])
            vel = (bv[b], bw[b])
            size = model.body_size[b].astype(dtype)
        f = dense_point_contact(int(gtype), x[sl], xd[sl], pose, vel, size,
                                tac_params[pair.param_index], ground,
                                interpret)
        tac_force = tac_force.at[sl].set(f)

    # project onto per-marker sensor axes (world = owner joint frame axes)
    n_w = spatial.quat_rotate(tq, model.tac_normal)
    a0_w = spatial.quat_rotate(tq, model.tac_axis0)
    a1_w = spatial.quat_rotate(tq, model.tac_axis1)
    return jnp.stack([jnp.sum(tac_force * a0_w, axis=-1),
                      jnp.sum(tac_force * a1_w, axis=-1),
                      jnp.sum(tac_force * n_w, axis=-1)], axis=-1)
