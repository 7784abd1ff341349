"""Shooting trajectory optimizer: swing a damped pendulum to the top with
limited torque — requires gradients through many implicit steps to find the
pump-up strategy."""

import jax
import jax.numpy as jnp
import numpy as np

from tactilesimulation_tpu.algorithms.shooting import ShootingOptimizer
from tactilesimulation_tpu.model import scenes
from tactilesimulation_tpu.sim.simulation import Simulator
import pytest

pytestmark = pytest.mark.slow  # compile-bound: minutes on the CPU mesh


def test_pendulum_swingup():
    struct, model = scenes.pendulum(timestep=1e-2, damping=0.05)
    sim = Simulator(struct, model)

    def cost(state, u):
        return 0.01 * jnp.sum(u**2) + (state.q[0] - jnp.pi) ** 2 * 0.1

    def final_cost(state):
        return 50.0 * (state.q[0] - jnp.pi) ** 2 + 5.0 * state.qdot[0] ** 2

    opt = ShootingOptimizer(sim, horizon=100, cost_fn=cost,
                            final_cost_fn=final_cost, u_bounds=(-6.0, 6.0),
                            iterations=150, lr=0.2)
    state0 = sim.init_state()
    us0 = jnp.zeros((100, 1))
    best_us, best_cost, history = opt.solve(model, state0, us0)
    # optimization made real progress
    assert float(history[-1]) < 0.5 * float(history[0])
    # roll out the solution: pendulum ends near the top
    s = state0
    for t in range(100):
        s = sim.step(model, s, jnp.clip(best_us[t], -6.0, 6.0))
    final_angle = float(s.q[0])
    assert abs(final_angle - np.pi) < 0.5, (
        f"swing-up failed: final angle {final_angle:.2f} (target pi)")
