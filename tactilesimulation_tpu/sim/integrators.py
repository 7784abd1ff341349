"""Implicit BDF1/BDF2 stepping with an implicit-function-theorem custom VJP.

Replaces the reference C++ time stepper + adjoint backward engine
(SURVEY.md C3/C7/C8). One step solves the *momentum-form* residual (discrete
Euler-Lagrange — see dynamics.py for why this form keeps the AD graphs
shallow):

    r(v') = p(q', v') - p_base - gamma * [dT/dq(q', v') + Q(q', v', u)]
    q'    = q_base + gamma * v'

with a chord iteration (Jacobian linearized and LU-factored once at the warm
start, best-iterate tracking as the safeguard, fixed masked iteration count —
static shapes for XLA). Coefficients:

    BDF1: gamma = h,    q_base = q,            p_base = p(q, v)
    BDF2: gamma = 2h/3, q_base = (4q - q_)/3,  p_base = (4 p(q,v) - p(q_,v_))/3
          (first step falls back to BDF1 — no history yet)

Gradients: ``newton_solve`` carries a ``jax.custom_vjp``. At the solution,
dv*/dtheta = -(dr/dv*)^{-1} dr/dtheta, so the backward pass is one transposed
dense solve plus one VJP through the residual. Because ``inputs`` includes the
whole ``Model`` pytree, this yields gradients w.r.t. initial state, controls,
AND design parameters (the reference's unused ``flag_p``, C7) in one shot.
``lax.scan`` over steps replaces the reference's LIFO backward cache (C8).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import dynamics
from .types import Model, SimState, Structure

class StepInputs(NamedTuple):
    model: Model
    u: jnp.ndarray
    q_base: jnp.ndarray
    p_base: jnp.ndarray
    gamma: jnp.ndarray


def ridge_eps(dtype) -> float:
    """Tikhonov ridge scale for the chord/IFT dense solves.

    The ridge added to the iteration matrix is ``ridge_eps * (mean|diag| + 1)``
    — scale-aware so near-massless dofs stay solvable in f32. This exact
    formula is shared with the lane-major solver (``lanes._ridge``): the chord
    iterates depend on the chord matrix, so ANY difference in the ridge between
    the two layouts breaks lane-parity at partially-converged solves
    (tests/test_lanes.py pins parity to round-off)."""
    return 1e-7 if dtype == jnp.float32 else 1e-12


def _ridged(J):
    """J (n, n) + scale-aware ridge. Lane-major twin: ``lanes._ridge``."""
    n = J.shape[0]
    diag_mag = jnp.mean(jnp.abs(jnp.diagonal(J)))
    return J + (ridge_eps(J.dtype) * (diag_mag + 1.0)) * jnp.eye(
        n, dtype=J.dtype)


def make_residual(struct: Structure, points_major: bool = False):
    """``points_major`` evaluates contact in the (3, N) points-in-lanes
    layout (sim/dense_single.py) — the dense-marker-field hot path."""
    def residual(v_new, inputs: StepInputs):
        qn = inputs.q_base + inputs.gamma * v_new
        # one reverse pass: dL/dq = dT/dq - dV/dq (Coriolis + gravity),
        # dL/dv = momentum
        dLdq, p_new = dynamics.el_terms(struct, inputs.model, qn, v_new)
        if points_major:
            from . import dense_single
            Q, _ = dense_single.applied_forces_points_major(
                struct, inputs.model, qn, v_new, inputs.u)
        else:
            Q, _ = dynamics.applied_forces(
                struct, inputs.model, qn, v_new, inputs.u)
        return p_new - inputs.p_base - inputs.gamma * (dLdq + Q)
    return residual


def _newton(residual_fn, max_iter, tol, inputs, v_guess):
    """Chord iteration with best-iterate tracking (fixed masked trip count).

    One ``jax.linearize`` at the warm start shares the primal residual with
    the Jacobian columns (cheaper graph than jacfwd + a separate residual);
    the LU factor is reused across iterations — the chord method. With
    h = 5e-3 warm starts this converges like full Newton at a fraction of the
    cost, and the custom VJP (below) evaluates the exact Jacobian at the
    converged solution, so gradient exactness is unaffected. A fixed
    ``fori_loop`` with convergence masking compiles ~3x faster than an
    early-exit while_loop and keeps batched lanes uniform on TPU.
    """
    n = v_guess.shape[0]
    eye = jnp.eye(n, dtype=v_guess.dtype)
    f32 = v_guess.dtype == jnp.float32
    rel = 1e-4 if f32 else 1e-7

    r0, lin = jax.linearize(lambda vv: residual_fn(vv, inputs), v_guess)
    J = jax.vmap(lin)(eye)  # row i = J @ e_i = column i => J^T; see solve below
    # scale-aware Tikhonov guard keeps near-massless dofs solvable in f32
    lu = jax.scipy.linalg.lu_factor(_ridged(J.T))

    rn0 = jnp.linalg.norm(r0)
    # residual-scale-aware tolerance: masses span 1e-5..1 kg across the
    # reference scenes, so a fixed absolute tol either stalls or spins
    tol_eff = jnp.maximum(jnp.asarray(tol, v_guess.dtype), rel * rn0)

    def body(i, carry):
        v, r, rn, v_best, rn_best = carry
        dv = jax.scipy.linalg.lu_solve(lu, r)
        v2 = jnp.where(rn <= tol_eff, v, v - dv)
        r2 = residual_fn(v2, inputs)
        rn2 = jnp.linalg.norm(r2)
        better = rn2 < rn_best
        v_best = jnp.where(better, v2, v_best)
        rn_best = jnp.where(better, rn2, rn_best)
        return v2, r2, rn2, v_best, rn_best

    carry = (v_guess, r0, rn0, v_guess, rn0)
    *_, v_best, _ = jax.lax.fori_loop(0, max_iter, body, carry)
    return v_best


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def newton_solve(residual_fn, max_iter, tol, inputs: StepInputs, v_guess):
    return _newton(residual_fn, max_iter, tol, inputs, v_guess)


def _newton_fwd(residual_fn, max_iter, tol, inputs, v_guess):
    v_star = _newton(residual_fn, max_iter, tol, inputs, v_guess)
    return v_star, (inputs, v_star)


def _newton_bwd(residual_fn, max_iter, tol, res, g):
    """IFT adjoint: ONE vjp linearization provides both the exact J^T at the
    solution (vmapped pullback applications) and the inputs cotangent —
    avoiding a second jacfwd graph in the backward pass."""
    inputs, v_star = res
    _, pullback = jax.vjp(residual_fn, v_star, inputs)
    n = v_star.shape[0]
    eye = jnp.eye(n, dtype=v_star.dtype)
    J = jax.vmap(lambda c: pullback(c)[0])(eye)  # row i = J^T e_i = J[i, :]
    lam = jnp.linalg.solve(_ridged(J.T), g)
    inputs_bar = pullback(-lam)[1]
    return inputs_bar, jnp.zeros_like(v_star)


newton_solve.defvjp(_newton_fwd, _newton_bwd)


def build_step(struct: Structure, points_major: bool = False):
    """Returns step(model, state, u) -> (state', tactile_force_world (Mtot,3)).

    The tactile field is evaluated at the new state (the reference queries
    ``get_tactile_force_vector`` after ``forward``, test_sim_speed.py:80).
    ``points_major`` routes contact through the (3, N) lane-efficient layout
    (dense marker scenes — see sim/dense_single.py)."""
    residual_fn = make_residual(struct, points_major=points_major)
    max_iter = struct.solver_max_iter
    use_bdf2 = struct.integrator.upper() == "BDF2"

    def step(model: Model, state: SimState, u):
        h = model.h
        dtype = state.q.dtype
        tol = max(struct.solver_tol, 1e-7 if dtype == jnp.float32 else 1e-12)
        p_now = dynamics.momentum(struct, model, state.q, state.qdot)
        if use_bdf2:
            first = (state.t == 0)
            p_prev = dynamics.momentum(struct, model, state.q_prev,
                                       state.qdot_prev)
            gamma = jnp.where(first, h, 2.0 * h / 3.0)
            q_base = jnp.where(first, state.q,
                               (4.0 * state.q - state.q_prev) / 3.0)
            p_base = jnp.where(first, p_now, (4.0 * p_now - p_prev) / 3.0)
        else:
            gamma, q_base, p_base = h, state.q, p_now
        inputs = StepInputs(model=model, u=jnp.asarray(u, dtype),
                            q_base=q_base, p_base=p_base,
                            gamma=jnp.asarray(gamma, dtype))
        v_new = newton_solve(residual_fn, max_iter, tol, inputs, state.qdot)
        q_new = q_base + gamma * v_new
        new_state = SimState(q=q_new, qdot=v_new, q_prev=state.q,
                             qdot_prev=state.qdot, t=state.t + 1)
        return new_state

    return step


def initial_state(struct: Structure, model: Model) -> SimState:
    return SimState(q=model.q_init, qdot=model.qdot_init,
                    q_prev=model.q_init, qdot_prev=model.qdot_init,
                    t=jnp.zeros((), jnp.int32))
