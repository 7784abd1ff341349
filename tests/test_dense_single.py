"""Points-major single-instance contact (sim/dense_single.py) parity.

The (3, N) points-in-lanes formulation must match dynamics.contact_terms to
round-off — values and gradients — on a small scene and on a dense-marker
rolling-ball scene, including an in-contact state (ball settled on the pad).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.model import task_scenes
from tactilesimulation_tpu.sim import dense_single, dynamics, integrators

SCENES = {
    "tactile_push": task_scenes.tactile_push,
    "rolling_ball_small": lambda: task_scenes.rolling_ball(resolution=8),
}


@pytest.mark.parametrize("scene", sorted(SCENES))
def test_points_major_matches_row_major(scene):
    struct, model = SCENES[scene]()
    n = struct.ndof_q
    rng = np.random.RandomState(0)
    q = jnp.asarray(np.asarray(model.q_init) + 0.01 * rng.randn(n))
    v = jnp.asarray(0.3 * rng.randn(n))

    Q0, tac0 = dynamics.contact_terms(struct, model, q, v)
    Q1, tac1 = dense_single.contact_terms_points_major(struct, model, q, v)
    sQ = float(jnp.max(jnp.abs(Q0))) + 1e-12
    assert float(jnp.max(jnp.abs(Q1 - Q0))) < 1e-9 * sQ
    assert float(jnp.max(jnp.abs(tac1 - tac0))) < 1e-9 * (
        float(jnp.max(jnp.abs(tac0))) + 1e-12)

    def loss(fn):
        def f(q, v):
            Q, tac = fn(struct, model, q, v)
            return jnp.sum(Q ** 2) + jnp.sum(tac ** 2)
        return f

    g0 = jax.grad(loss(dynamics.contact_terms), argnums=(0, 1))(q, v)
    g1 = jax.grad(loss(dense_single.contact_terms_points_major),
                  argnums=(0, 1))(q, v)
    for a, b in zip(g1, g0):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-9 * (
            float(jnp.max(jnp.abs(b))) + 1e-12)


@pytest.mark.slow
def test_points_major_in_contact_tactile_field():
    """Settle the ball onto the pad, then pin the tactile field and its
    gradient against the row-major formulation in an ACTIVE-contact state."""
    struct, model = task_scenes.rolling_ball(resolution=8)
    step_pm = integrators.build_step(struct, points_major=True)
    state = integrators.initial_state(struct, model)
    u = jnp.zeros(struct.ndof_u, state.q.dtype)
    for _ in range(40):
        state = step_pm(model, state, u)
    tac_pm = dense_single.tactile_field_points_major(
        struct, model, state.q, state.qdot)
    tac_rm = dynamics.tactile_field(struct, model, state.q, state.qdot)
    assert float(jnp.max(jnp.abs(tac_pm))) > 0, "ball must touch the pad"
    assert float(jnp.max(jnp.abs(tac_pm - tac_rm))) < 1e-9 * float(
        jnp.max(jnp.abs(tac_rm)))

    # one differentiable step through the points-major residual
    def loss(us):
        s = state
        s = step_pm(model, s, us)
        tac = dense_single.tactile_field_points_major(struct, model, s.q,
                                                      s.qdot)
        return jnp.sum(tac ** 2) + jnp.sum(s.q ** 2)

    g = jax.grad(loss)(u)
    assert bool(jnp.all(jnp.isfinite(g)))
