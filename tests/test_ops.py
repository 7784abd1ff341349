"""Pallas dense-contact kernel vs the jnp contact oracle.

Runs in interpret mode on the CPU test backend; the same kernel compiles on
TPU (exercised by the FPS benchmark / facade query path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.model.schema import (GEOM_CUBOID, GEOM_CYLINDER,
                                                GEOM_SPHERE)
from tactilesimulation_tpu.ops import dense_contact, tactile_query
from tactilesimulation_tpu.sim import contact, dynamics, spatial
from tactilesimulation_tpu.sim.contact import GROUND

pytestmark = pytest.mark.slow  # compile-bound: minutes on the CPU mesh


def _oracle(gtype, x, xd, pose, vel, size, params, ground):
    p, R = pose
    v, w = vel
    if gtype == GROUND:
        n = jnp.broadcast_to(ground[1], x.shape)
        phi = (x - ground[0]) @ ground[1]
        v_rel = xd
    else:
        xl = (x - p) @ R  # R^T (x - p) rowwise
        if gtype == GEOM_SPHERE:
            phi, gl = contact._sdf_sphere(xl, size[0])
        elif gtype == GEOM_CUBOID:
            phi, gl = contact._sdf_box(xl, size / 2.0)
        else:
            phi, gl = contact._sdf_cylinder(xl, size[0], size[1])
        n = gl @ R.T
        v_prim = v + jnp.cross(jnp.broadcast_to(w, x.shape), x - p)
        v_rel = xd - v_prim
    return contact.penalty_force(phi, n, v_rel,
                                 params[0], params[1], params[2], params[3])


@pytest.mark.parametrize("gtype", [GROUND, GEOM_SPHERE, GEOM_CUBOID,
                                   GEOM_CYLINDER])
def test_dense_contact_matches_oracle(gtype):
    rng = np.random.default_rng(0 if gtype == GROUND else gtype)
    N = 257  # non-multiple of 128 exercises lane padding
    x = jnp.asarray(rng.normal(scale=0.05, size=(N, 3)))
    xd = jnp.asarray(rng.normal(scale=0.2, size=(N, 3)))
    quat = spatial.rotvec_to_quat(jnp.asarray(rng.normal(size=3) * 0.5))
    pose = (jnp.asarray(rng.normal(scale=0.01, size=3)),
            spatial.quat_to_mat(quat))
    vel = (jnp.asarray(rng.normal(size=3) * 0.1),
           jnp.asarray(rng.normal(size=3) * 0.5))
    size = jnp.asarray([0.06, 0.04, 0.05])
    params = jnp.asarray([1e4, 5e2, 1.2, 1e3])
    ground = (jnp.zeros(3), jnp.asarray([0.0, 0.0, 1.0]))

    f_kernel = dense_contact.dense_point_contact(
        gtype, x, xd, pose, vel, size, params, ground, True)
    f_oracle = _oracle(gtype, x, xd, pose, vel, size, params, ground)
    np.testing.assert_allclose(np.asarray(f_kernel), np.asarray(f_oracle),
                               rtol=1e-6, atol=1e-9)
    # some points must actually be in contact for the test to mean anything
    assert float(jnp.sum(jnp.abs(f_kernel))) > 0


def test_tactile_query_matches_dynamics():
    """Fast query path == dynamics.tactile_field on a real scene."""
    from tactilesimulation_tpu.model import task_scenes
    from tactilesimulation_tpu.sim import kinematics
    struct, model = task_scenes.tactile_push()
    assert tactile_query.supported(struct)
    rng = np.random.default_rng(3)
    # place the box so its face penetrates the tactile pad (ee markers sit on
    # the pad surface and the box face respectively)
    var = kinematics.ee_positions(struct, model, model.q_init).reshape(2, 3)
    off = struct.joint_dof_offset[struct.joint_index("box_translational_joint")]
    dq = var[0] - var[1] - jnp.asarray([0.001, 0.0, 0.0])
    q = model.q_init
    q = q.at[off:off + 3].add(dq)
    v = jnp.asarray(rng.normal(scale=0.1, size=struct.ndof_q))
    ref = dynamics.tactile_field(struct, model, q, v)
    fast = tactile_query.tactile_field(struct, model, q, v, interpret=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-6, atol=1e-12)
    assert float(jnp.sum(jnp.abs(ref))) > 0
