"""Chord-iteration budget accuracy study.

The implicit substep runs a fixed-trip chord iteration (integrators._newton /
lanes._newton). Its cost is linear in ``solver_max_iter`` but warm starts
(substep-to-substep) make late iterations redundant. This script quantifies
the trajectory error of reduced budgets on a full TactilePush episode in
float64 against a high-budget reference (max_iter=30), so the shipped budget
is an evidence-backed choice rather than a copied default.

Run: python bench_solver_accuracy.py [--horizon 50] [--iters 2 4 6 10]
Prints one JSON line per budget with q-trajectory RMSE and total-reward error.
"""

import argparse
import dataclasses
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--iters", type=int, nargs="+", default=[2, 3, 4, 6, 10])
    ap.add_argument("--ref-iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tactilesimulation_tpu.envs import tactile_push

    def episode(max_iter):
        from tactilesimulation_tpu.sim import integrators
        env = tactile_push.make("no_tactile")
        env.struct = dataclasses.replace(env.struct,
                                         solver_max_iter=max_iter)
        env._step_sim = integrators.build_step(env.struct)

        def run(key):
            state, obs = env.reset(key)
            us = 0.3 * jax.random.normal(
                jax.random.PRNGKey(7), (args.horizon, env.ndof_u))

            def body(carry, u):
                st, _ = carry
                st, obs, r, d, info = env.step(st, u)
                return (st, obs), (st.sim.q, r)

            (_, _), (qs, rs) = jax.lax.scan(body, (state, obs), us)
            return qs, jnp.sum(rs)

        return jax.jit(run)(jax.random.PRNGKey(0))

    q_ref, r_ref = episode(args.ref_iters)
    q_ref, r_ref = np.asarray(q_ref), float(r_ref)
    out = []
    for mi in args.iters:
        qs, r = episode(mi)
        rmse = float(np.sqrt(np.mean((np.asarray(qs) - q_ref) ** 2)))
        rel = rmse / (float(np.sqrt(np.mean(q_ref ** 2))) + 1e-30)
        rec = {"metric": f"chord_budget_{mi}_traj_rmse", "value": rmse,
               "unit": f"q RMSE vs max_iter={args.ref_iters} "
                       f"(TactilePush H={args.horizon}, f64)",
               "rel_rmse": rel,
               "reward_abs_err": abs(float(r) - r_ref)}
        print(json.dumps(rec))
        out.append(rec)
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
