"""Batched gradient-based trajectory optimization (shooting) + receding-
horizon MPC.

The north-star workload (BASELINE.json): thousands of differentiable rollouts
batched per chip, each solving a control sequence by gradient descent through
the simulator. One ``solve`` call runs ``num_starts`` independent multi-start
optimizations as a single vmapped jitted program (Adam over the control
sequence, BPTT through the implicit-integrator custom VJPs); scaling across
chips is episode-axis sharding (parallel/mesh.py).

The reference has no trajectory optimizer (its GD trains a policy instead);
this module is the direct consumer of the same differentiable rollout
machinery and what an iLQR/MPC user would reach for.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


class ShootingOptimizer:
    """min_u  sum_t cost(state_t, u_t) over a rollout of ``horizon`` steps.

    cost_fn(state, u) -> scalar running cost; final_cost_fn(state) -> scalar.
    Both receive the SimState pytree. Controls are clipped to u_bounds.
    """

    def __init__(self, simulator, horizon: int, cost_fn: Callable,
                 final_cost_fn: Optional[Callable] = None,
                 u_bounds: Optional[tuple] = None, iterations: int = 100,
                 lr: float = 0.1, remat: bool = True):
        self.sim = simulator
        self.horizon = horizon
        self.iterations = iterations
        struct = simulator.struct
        step = simulator._step

        def total_cost(model, state0, us):
            def body(state, u):
                if u_bounds is not None:
                    u = jnp.clip(u, u_bounds[0], u_bounds[1])
                new_state = step(model, state, u)
                return new_state, cost_fn(new_state, u)

            fbody = jax.checkpoint(body) if remat else body
            state, costs = jax.lax.scan(fbody, state0, us)
            total = jnp.sum(costs)
            if final_cost_fn is not None:
                total = total + final_cost_fn(state)
            return total

        optimizer = optax.adam(lr)

        def solve_single(model, state0, us0):
            opt_state = optimizer.init(us0)

            def opt_step(carry, _):
                us, opt_state, best_us, best_cost = carry
                cost, grads = jax.value_and_grad(total_cost, argnums=2)(
                    model, state0, us)
                updates, opt_state = optimizer.update(grads, opt_state, us)
                new_us = optax.apply_updates(us, updates)
                better = cost < best_cost
                best_us = jnp.where(better, us, best_us)
                best_cost = jnp.where(better, cost, best_cost)
                return (new_us, opt_state, best_us, best_cost), cost

            init = (us0, opt_state, us0, jnp.asarray(jnp.inf, us0.dtype))
            (_, _, best_us, best_cost), history = jax.lax.scan(
                opt_step, init, None, length=iterations)
            return best_us, best_cost, history

        self._solve_single = jax.jit(solve_single)
        self._solve_batch = jax.jit(jax.vmap(solve_single, in_axes=(None, None, 0)))
        self._total_cost = jax.jit(total_cost)

    def solve(self, model, state0, us0):
        """us0 (H, nu) -> (best_us, best_cost, cost_history)."""
        return self._solve_single(model, state0, us0)

    def solve_multistart(self, model, state0, key, num_starts: int,
                        init_scale: float = 0.1):
        """Vmapped multi-start; returns the best control sequence found."""
        nu = self.sim.struct.ndof_u
        us0 = init_scale * jax.random.normal(
            key, (num_starts, self.horizon, nu), self.sim.model.q_init.dtype)
        best_us, best_cost, _ = self._solve_batch(model, state0, us0)
        i = jnp.argmin(best_cost)
        return best_us[i], best_cost[i]

    def mpc_step(self, model, state, us_warm, replan_iters: int = 10):
        """Receding-horizon: re-optimize from ``state`` warm-started by the
        shifted previous plan; returns (u0, shifted_plan)."""
        us0 = jnp.concatenate([us_warm[1:], us_warm[-1:]], axis=0)
        best_us, _, _ = self._solve_single(model, state, us0)
        return best_us[0], best_us
