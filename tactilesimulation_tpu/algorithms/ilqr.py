"""Batched iLQR (Gauss-Newton / DDP) trajectory optimization.

Second-order companion to ``ShootingOptimizer`` (algorithms/shooting.py):
instead of first-order Adam steps on the control sequence, each iteration
linearizes the implicit-integrator dynamics along the nominal trajectory
(A_t = df/ds, B_t = df/du via reverse-mode AD through the IFT custom VJP),
quadratizes the cost, runs the Riccati backward pass, and line-searches the
resulting affine policy  u = u_nom + alpha k + K (s - s_nom)  in a single
forward rollout per candidate step length. This is Gauss-Newton on the
control problem (DDP without dynamics second derivatives) — the
"Gauss-Newton/QP blocks" of the BASELINE.json north star: per-step dense
solves over tiny (nu, nu) matrices, batched over lanes/starts with vmap,
everything inside one jitted ``lax.scan``.

The reference repo has no trajectory optimizer at all (SURVEY.md: its GD
trains a policy); this module exists because an MPC user of a differentiable
simulator expects one, and because second-order steps converge in far fewer
rollouts than Adam shooting (pinned by tests/test_ilqr.py: <= 1/4 of the
iterations on pendulum AND TactilePush).

State convention: s = [q, qdot, q_prev, qdot_prev] (4n,) — the full
integrator state, so BDF2 history is differentiated through correctly; the
step counter enters as a per-index constant (it only gates the BDF2 cold
start).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..sim.types import SimState


def _pack(state: SimState):
    return jnp.concatenate([state.q, state.qdot, state.q_prev,
                            state.qdot_prev])


def _unpack(s, n, t):
    return SimState(q=s[0:n], qdot=s[n:2 * n], q_prev=s[2 * n:3 * n],
                    qdot_prev=s[3 * n:4 * n], t=t)


class ILQROptimizer:
    """min_u sum_t cost(state_t, u_t) + final_cost(state_H).

    Same interface as ShootingOptimizer: cost_fn(SimState, u) -> scalar,
    final_cost_fn(SimState) -> scalar, controls clipped to u_bounds inside
    the dynamics. ``solve`` returns (best_us, best_cost, cost_history).
    """

    def __init__(self, simulator, horizon: int, cost_fn: Callable,
                 final_cost_fn: Optional[Callable] = None,
                 u_bounds: Optional[tuple] = None, iterations: int = 10,
                 mu_init: float = 1e-6, mu_factor: float = 10.0,
                 alphas=(1.0, 0.5, 0.25, 0.1, 0.03)):
        self.sim = simulator
        self.horizon = horizon
        self.iterations = iterations
        struct = simulator.struct
        step = simulator._step
        n = struct.ndof_q
        nu = struct.ndof_u
        ns = 4 * n
        alphas = jnp.asarray(alphas)

        def f(model, s, u, t):
            if u_bounds is not None:
                u = jnp.clip(u, u_bounds[0], u_bounds[1])
            return _pack(step(model, _unpack(s, n, t), u))

        def c(s, u, t):
            if u_bounds is not None:
                u = jnp.clip(u, u_bounds[0], u_bounds[1])
            return cost_fn(_unpack(s, n, t), u)

        def cf(s, t):
            if final_cost_fn is None:
                return jnp.zeros((), s.dtype)
            return final_cost_fn(_unpack(s, n, t))

        def rollout(model, s0, t0, us):
            def body(carry, xs):
                s, = carry
                u, idx = xs
                s2 = f(model, s, u, t0 + idx)
                return (s2,), (s2, c(s, u, t0 + idx))

            idxs = jnp.arange(us.shape[0])
            (sH,), (ss, costs) = jax.lax.scan(body, (s0,), (us, idxs))
            total = jnp.sum(costs) + cf(sH, t0 + us.shape[0])
            return ss, total

        def derivs(model, s, u, t):
            A = jax.jacrev(f, argnums=1)(model, s, u, t)   # (ns, ns)
            B = jax.jacrev(f, argnums=2)(model, s, u, t)   # (ns, nu)
            cx = jax.grad(c, argnums=0)(s, u, t)
            cu = jax.grad(c, argnums=1)(s, u, t)
            cxx = jax.hessian(c, argnums=0)(s, u, t)
            cuu = jax.hessian(c, argnums=1)(s, u, t)
            cux = jax.jacrev(jax.grad(c, argnums=1), argnums=0)(s, u, t)
            return A, B, cx, cu, cxx, cuu, cux

        def backward(As, Bs, cxs, cus, cxxs, cuus, cuxs, Vx, Vxx, mu):
            def body(carry, xs):
                Vx, Vxx = carry
                A, B, cx, cu, cxx, cuu, cux = xs
                Qx = cx + A.T @ Vx
                Qu = cu + B.T @ Vx
                Qxx = cxx + A.T @ Vxx @ A
                Quu = cuu + B.T @ Vxx @ B + mu * jnp.eye(nu, dtype=A.dtype)
                Qux = cux + B.T @ Vxx @ A
                k = -jnp.linalg.solve(Quu, Qu)
                K = -jnp.linalg.solve(Quu, Qux)
                Vx2 = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
                Vxx2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
                Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
                return (Vx2, Vxx2), (k, K)

            (_, _), (ks, Ks) = jax.lax.scan(
                body, (Vx, Vxx),
                (As, Bs, cxs, cus, cxxs, cuus, cuxs), reverse=True)
            return ks, Ks

        def forward_alpha(model, s0, t0, us, ss_nom, ks, Ks, alpha):
            """Closed-loop rollout with u = u_nom + alpha k + K (s - s_nom)."""
            s_noms = jnp.concatenate([s0[None], ss_nom[:-1]], axis=0)

            def body(carry, xs):
                s, = carry
                u_nom, s_nom, k, K, idx = xs
                u = u_nom + alpha * k + K @ (s - s_nom)
                s2 = f(model, s, u, t0 + idx)
                return (s2,), (u, c(s, u, t0 + idx))

            idxs = jnp.arange(us.shape[0])
            (sH,), (us2, costs) = jax.lax.scan(
                body, (s0,), (us, s_noms, ks, Ks, idxs))
            total = jnp.sum(costs) + cf(sH, t0 + us.shape[0])
            return us2, total

        def solve_single(model, state0, us0):
            s0 = _pack(state0)
            t0 = state0.t
            dtype = s0.dtype

            def iteration(carry, _):
                us, cost, mu = carry
                ss, _ = rollout(model, s0, t0, us)
                s_noms = jnp.concatenate([s0[None], ss[:-1]], axis=0)
                idxs = jnp.arange(us.shape[0])
                A, B, cx, cu, cxx, cuu, cux = jax.vmap(
                    derivs, in_axes=(None, 0, 0, 0))(model, s_noms, us,
                                                     t0 + idxs)
                VxH = jax.grad(cf, argnums=0)(ss[-1], t0 + us.shape[0])
                VxxH = jax.hessian(cf, argnums=0)(ss[-1], t0 + us.shape[0])
                ks, Ks = backward(A, B, cx, cu, cxx, cuu, cux, VxH, VxxH, mu)
                cand_us, cand_cost = jax.vmap(
                    lambda a: forward_alpha(model, s0, t0, us, ss, ks, Ks, a)
                )(alphas)
                i = jnp.argmin(cand_cost)
                improved = cand_cost[i] < cost
                us2 = jnp.where(improved, cand_us[i], us)
                cost2 = jnp.where(improved, cand_cost[i], cost)
                mu2 = jnp.where(improved,
                                jnp.maximum(mu / mu_factor, 1e-9),
                                jnp.minimum(mu * mu_factor, 1e6))
                return (us2, cost2, mu2), cost2

            _, cost0 = rollout(model, s0, t0, us0)
            init = (us0, cost0, jnp.asarray(mu_init, dtype))
            (us, cost, _), history = jax.lax.scan(iteration, init, None,
                                                  length=iterations)
            if u_bounds is not None:
                us = jnp.clip(us, u_bounds[0], u_bounds[1])
            return us, cost, history

        self._solve_single = jax.jit(solve_single)
        self._solve_batch = jax.jit(
            jax.vmap(solve_single, in_axes=(None, None, 0)))

    def solve(self, model, state0, us0):
        """us0 (H, nu) -> (best_us, best_cost, cost_history)."""
        return self._solve_single(model, state0, us0)

    def solve_multistart(self, model, state0, key, num_starts: int,
                         init_scale: float = 0.1):
        nu = self.sim.struct.ndof_u
        us0 = init_scale * jax.random.normal(
            key, (num_starts, self.horizon, nu), self.sim.model.q_init.dtype)
        best_us, best_cost, _ = self._solve_batch(model, state0, us0)
        i = jnp.argmin(best_cost)
        return best_us[i], best_cost[i]

    def mpc_step(self, model, state, us_warm):
        """Receding-horizon: re-optimize from ``state`` warm-started by the
        shifted previous plan; returns (u0, new_plan)."""
        us0 = jnp.concatenate([us_warm[1:], us_warm[-1:]], axis=0)
        best_us, _, _ = self._solve_single(model, state, us0)
        return best_us[0], best_us
