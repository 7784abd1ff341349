"""Core simulator correctness: integrator semantics, dynamics identities,
contact behavior, and finite-difference gradient checks.

This is the test layer the reference lacks (SURVEY.md §4): unit tests against
analytic/FD oracles instead of eyeballed example scripts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.model import scenes
from tactilesimulation_tpu.sim import dynamics, integrators
from tactilesimulation_tpu.sim.simulation import Simulator

pytestmark = pytest.mark.slow  # compile-bound: minutes on the CPU mesh


@pytest.fixture(scope="module")
def pendulum():
    return scenes.pendulum(timestep=5e-3)


def test_pendulum_implicit_euler_oracle(pendulum):
    """One BDF1 step must satisfy the implicit-Euler equations of the analytic
    pendulum ODE: I w' = I w - h m g l sin(th + h w')."""
    struct, model = pendulum
    sim = Simulator(struct, model)
    th0 = 0.7
    state = sim.init_state(q=jnp.array([th0]), qdot=jnp.array([0.0]))
    state = sim.step(model, state, jnp.zeros(1))

    m = float(model.body_mass[0])
    l = 0.5
    I = float(model.body_inertia[0, 1]) + m * l * l  # about hinge axis (y)
    g, h = 9.8, 5e-3
    w_new = float(state.qdot[0])
    th_new = float(state.q[0])
    # residual of the analytic implicit-Euler equation at the solver's answer
    res = I * w_new - (I * 0.0 - h * m * g * l * np.sin(th0 + h * w_new))
    assert abs(res) < 1e-8 * max(1.0, abs(I * w_new))
    assert np.isclose(th_new, th0 + h * w_new)


def test_pendulum_energy_dissipates(pendulum):
    struct, model = pendulum
    sim = Simulator(struct, model)
    state = sim.init_state(q=jnp.array([1.2]), qdot=jnp.array([0.0]))

    def energy(s):
        return float(dynamics.kinetic_energy(struct, model, s.q, s.qdot)
                     + dynamics.potential_energy(struct, model, s.q))

    e0 = energy(state)
    es = []
    for _ in range(200):
        state = sim.step(model, state, jnp.zeros(1))
        es.append(energy(state))
    # implicit Euler dissipates; energy must never grow beyond tolerance
    assert max(es) <= e0 + 1e-6
    # and the pendulum is still swinging (not over-damped to a halt)
    assert abs(float(state.qdot[0])) + abs(float(state.q[0])) > 1e-3


def test_momentum_equals_Mv():
    struct, model = scenes.pendulum()[0:2]
    struct, model = scenes.falling_box()
    key = jax.random.PRNGKey(0)
    q = 0.1 * jax.random.normal(key, (struct.ndof_q,))
    v = jax.random.normal(jax.random.PRNGKey(1), (struct.ndof_q,))
    M = dynamics.mass_matrix(struct, model, q)
    p = dynamics.momentum(struct, model, q, v)
    np.testing.assert_allclose(np.asarray(M @ v), np.asarray(p), rtol=1e-9,
                               atol=1e-12)
    # mass matrix symmetric PD
    Mn = np.asarray(M)
    np.testing.assert_allclose(Mn, Mn.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(Mn) > 0)


def test_falling_box_settles_on_ground():
    struct, model = scenes.falling_box()
    sim = Simulator(struct, model)
    state = sim.init_state()
    for _ in range(300):
        state = sim.step(model, state, jnp.zeros(0))
    q = np.asarray(state.q)
    # box (full extent 0.1, joint at 0.2) settles with COM near z=0.05
    # relative to joint origin 0.2 => q_z ~ -0.15 (+ small penetration)
    assert abs(q[2] + 0.15) < 5e-3
    assert np.linalg.norm(np.asarray(state.qdot)) < 1e-3
    # no lateral drift or rotation
    assert np.linalg.norm(q[[0, 1, 3, 4, 5]]) < 1e-6


def test_step_gradient_matches_fd():
    """d(next state)/d(u, q0, v0) via the IFT custom VJP vs central FD."""
    struct, model = scenes.pendulum(damping=0.1)
    sim = Simulator(struct, model)
    state = sim.init_state(q=jnp.array([0.5]), qdot=jnp.array([0.3]))

    def out(u, q0, v0):
        s = state.replace(q=q0, qdot=v0)
        s = sim.step(model, s, u)
        return s.q[0] + 0.7 * s.qdot[0]

    u0 = jnp.array([0.2])
    g_u, g_q, g_v = jax.grad(out, argnums=(0, 1, 2))(
        u0, state.q, state.qdot)
    eps = 1e-6
    for g, idx in [(g_u, 0), (g_q, 1), (g_v, 2)]:
        args = [u0, state.q, state.qdot]
        ap, am = list(args), list(args)
        ap[idx] = args[idx] + eps
        am[idx] = args[idx] - eps
        fd = (out(*ap) - out(*am)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[0], float(fd), rtol=1e-5,
                                   atol=1e-8)


def test_rollout_gradient_matches_fd_with_contact():
    """BPTT through 10 contact-rich steps vs FD — the core differentiable-sim
    guarantee (reference GD.test_simple_gradient methodology, gd.py:407-468)."""
    struct, model = scenes.falling_box(kn=1e3, kt=5.0, mu=0.8, damping=1.0)
    sim = Simulator(struct, model)
    # start slightly above ground, moving sideways -> slides through contact
    q0 = jnp.array([0.0, 0.0, -0.145, 0.0, 0.0, 0.0])
    v0 = jnp.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0])
    state0 = sim.init_state(q=q0, qdot=v0)

    @jax.jit
    def loss(v_init):
        s = state0.replace(qdot=v_init)
        s, _ = jax.lax.scan(
            lambda s, _: (sim._step(model, s, jnp.zeros(0)), None), s, None,
            length=10)
        return jnp.sum(s.q[:3] ** 2) + 0.1 * jnp.sum(s.qdot**2)

    g = jax.jit(jax.grad(loss))(v0)
    eps = 1e-6
    for i in range(6):
        dv = jnp.zeros(6).at[i].set(eps)
        fd = (loss(v0 + dv) - loss(v0 - dv)) / (2 * eps)
        np.testing.assert_allclose(
            float(g[i]), float(fd), rtol=2e-4, atol=1e-7,
            err_msg=f"grad mismatch at v0[{i}]")


def test_design_parameter_gradients():
    """Gradients w.r.t. Model leaves (the reference's unused flag_p, C7):
    d(final height)/d(body density scale) via the same custom VJP."""
    struct, model = scenes.falling_box()
    sim = Simulator(struct, model)

    @jax.jit
    def loss(mass_scale):
        m = model.replace(body_mass=model.body_mass * mass_scale)
        s = sim.init_state(m)
        s, _ = jax.lax.scan(
            lambda s, _: (sim._step(m, s, jnp.zeros(0)), None), s, None,
            length=5)
        return s.q[2]

    g = jax.jit(jax.grad(loss))(jnp.asarray(1.0))
    eps = 1e-6
    fd = (loss(jnp.asarray(1.0 + eps)) - loss(jnp.asarray(1.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4, atol=1e-9)
