"""Sphere rolling physics: friction must torque the ball (regression test for
the analytic sphere-contact application point)."""

import jax
import jax.numpy as jnp
import numpy as np

from tactilesimulation_tpu.model.scenes import SceneBuilder
from tactilesimulation_tpu.sim.simulation import Simulator
import pytest

pytestmark = pytest.mark.slow  # compile-bound: minutes on the CPU mesh


def _ball_scene():
    b = SceneBuilder("ball", timestep=2e-3, ground=(0, 0, 0))
    j = b.add_joint("free", "free3d-exp", pos=(0, 0, 0.05))
    ball = b.add_body("ball", j, "sphere", size=(0.05,), density=1000.0)
    b.add_ground_contact(ball, kn=5e4, kt=100.0, mu=0.8, damping=1e3)
    return b.build()


def test_ball_rolls_not_slides():
    struct, model = _ball_scene()
    sim = Simulator(struct, model)
    # start resting on the ground, sliding at 1 m/s in +x
    q0 = jnp.zeros(6)
    v0 = jnp.zeros(6).at[0].set(1.0)
    state = sim.init_state(q=q0, qdot=v0)
    for _ in range(400):
        state = sim.step(model, state, jnp.zeros(0))
    v = np.asarray(state.qdot)
    vx, wy = v[0], v[4]
    r = 0.05
    # friction converts slide into roll: omega_y * r ~ vx (rolling without
    # slipping), with the classic 5/7 terminal velocity of a slipping sphere
    assert vx > 0.5, f"ball stopped instead of rolling (vx={vx})"
    assert wy > 1.0, f"no angular velocity developed (wy={wy}) — torque missing"
    np.testing.assert_allclose(wy * r, vx, rtol=0.05,
                               err_msg="not rolling without slipping")
    np.testing.assert_allclose(vx, 5.0 / 7.0, rtol=0.05,
                               err_msg="terminal rolling speed != 5/7 v0")
