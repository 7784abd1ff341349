"""redmax_py-facade parity tests: the host Simulation class must reproduce
the reference binding semantics (SURVEY.md §2.3) including the backward
engine, against gradients computed natively on the functional API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.model import scenes
from tactilesimulation_tpu.sim.simulation import Simulation, Simulator

pytestmark = pytest.mark.slow  # compile-bound: minutes on the CPU mesh


@pytest.fixture(scope="module")
def sim():
    return Simulation(scenes.pendulum(damping=0.05))


def test_facade_surface(sim):
    assert sim.ndof_r == 1 and sim.ndof_u == 1
    assert sim.ndof_var == 0 and sim.ndof_tactile == 0
    q0 = np.array([0.4])
    sim.set_state_init(q0, np.zeros(1))
    sim.reset(backward_flag=False)
    np.testing.assert_array_equal(sim.get_q(), q0)
    sim.set_u(np.array([0.3]))
    sim.forward(5)
    assert sim.get_q()[0] != q0[0]
    assert sim.export_trajectory().shape == (6, 1)


def test_multistep_forward_matches_stepwise(sim):
    """forward(N) (one scanned device program) must equal N x forward(1)
    (host loop) — state, trajectory, and episode recording."""
    q0 = np.array([0.25])
    sim.set_state_init(q0, np.zeros(1))
    sim.reset(backward_flag=True)
    sim.set_u(np.array([0.4]))
    sim.forward(6)
    q_scan = sim.get_q().copy()
    traj_scan = sim.export_trajectory().copy()
    ep_scan = sim._episode
    # reset() seeds snapshots[0]; each step appends its pre-step state
    assert len(ep_scan.us) == 6 and len(ep_scan.state_snapshots) == 7

    sim.reset(backward_flag=True)
    sim.set_u(np.array([0.4]))
    for _ in range(6):
        sim.forward(1)
    np.testing.assert_allclose(sim.get_q(), q_scan, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(sim.export_trajectory(), traj_scan,
                               rtol=1e-12, atol=1e-12)
    for a, b in zip(ep_scan.state_snapshots, sim._episode.state_snapshots):
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=1e-12, atol=1e-12)


def test_facade_backward_matches_native_grad(sim):
    """EpisodicSimFunction-style backward (redmax_torch_functions.py:70-109):
    seed df_dq over the horizon, call backward(), compare df_du/df_dq0 with
    jax.grad through the functional rollout."""
    T = 6
    q0 = np.array([0.3])
    us = 0.2 * np.sin(np.arange(T))[:, None]

    sim.set_state_init(q0, np.zeros(1))
    sim.reset(backward_flag=True)
    for t in range(T):
        sim.set_u(us[t])
        sim.forward(1)
    sim.saveBackwardCache()
    sim.popBackwardCache()
    sim.backward_info.set_flags(flag_q0=True, flag_qdot0=True, flag_p=False,
                                flag_u=True)
    df_dq = np.ones(T * 1)  # dL/dq_t = 1 for all t  => L = sum_t q_t
    sim.backward_info.df_dq = df_dq
    sim.backward_info.df_dvar = np.zeros(0)
    sim.backward_info.df_dtactile = np.zeros(0)
    sim.backward()
    facade_du = sim.backward_results.df_du.reshape(T, 1)
    facade_dq0 = sim.backward_results.df_dq0

    # native reference: L(q0, us) = sum of q over the trajectory
    simulator = sim.sim
    struct, model = sim.struct, sim.model

    def L(q0_, us_):
        state = simulator.init_state(model, q=q0_, qdot=jnp.zeros(1))

        def body(s, u):
            s = simulator._step(model, s, u)
            return s, s.q

        _, qs = jax.lax.scan(body, state, us_)
        return jnp.sum(qs)

    g_q0, g_us = jax.grad(L, argnums=(0, 1))(jnp.asarray(q0), jnp.asarray(us))
    np.testing.assert_allclose(facade_du, np.asarray(g_us), rtol=1e-7,
                               atol=1e-12)
    np.testing.assert_allclose(facade_dq0, np.asarray(g_q0), rtol=1e-7,
                               atol=1e-12)


def test_backward_steps_last_frame(sim):
    """StepSimFunction-style backward_steps (redmax_torch_functions.py:140-174):
    gradient of the LAST frame's q w.r.t. the last num_steps controls."""
    sim.set_state_init(np.array([0.1]), np.zeros(1))
    sim.reset(backward_flag=True)
    for t in range(8):
        sim.set_u(np.array([0.1]))
        sim.forward(1)
    n = 3
    sim.backward_info.set_flags(False, False, False, True)
    df_dq = np.zeros(n)
    df_dq[-1] = 1.0
    sim.backward_info.df_dq = df_dq
    sim.backward_info.df_dvar = np.zeros(0)
    sim.backward_info.df_dtactile = np.zeros(0)
    sim.backward_steps(n)
    du = sim.backward_results.df_du
    assert du.shape == (n,)
    assert np.all(np.isfinite(du))
    assert abs(du[-1]) > 0


def test_update_api(sim):
    """Runtime model editing (C9)."""
    m0 = float(sim.model.body_mass[0])
    sim.update_body_density("bob", 2000.0)
    assert np.isclose(float(sim.model.body_mass[0]), 2 * m0)
    sim.update_joint_damping("hinge", 0.5)
    assert np.isclose(float(sim.model.dof_damping[0]), 0.5)
    sim.update_body_density("bob", 1000.0)
    sim.update_joint_damping("hinge", 0.05)
