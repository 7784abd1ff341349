"""Accuracy study for the amortized-chord lane solver (round 4).

Evaluates the (refresh, bwd_mode, max_iter, fused) grid of the lane-major
TactilePush env against a converged reference (refresh=1, exact adjoint,
max_iter=30) on REAL env trajectories from reset (warm-started chords — the
regime the solver actually runs in, unlike cold perturbed states):

- trajectory: relative q-RMSE over an H-step episode
- gradient:   cosine of d(sum reward)/d(controls) (the GD/BPTT quantity)

Run on TPU (f32, the shipped configuration):
    python bench_solver_accuracy_lanes.py [--horizon 50] [--batch 8]
Appends one JSON line per config to artifacts/SOLVER_ACCURACY_r04.jsonl.
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--obs", default="no_tactile")
    ap.add_argument("--ref-iters", type=int, default=30)
    ap.add_argument("--configs", nargs="+", default=[
        "1:exact:6:0", "5:exact:6:0", "5:stale:6:0", "5:stale:6:1",
        "5:stale:8:0", "5:exact:6:1", "1:exact:6:1",
    ], help="refresh:bwd:max_iter:fused")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tactilesimulation_tpu.envs import tactile_push

    H, B = args.horizon, args.batch
    env = tactile_push.make(args.obs)
    lenv = env.lane_env()
    keys = jax.random.split(jax.random.PRNGKey(123), B)
    nu = env.ndof_u
    us = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (H, B, nu))

    def build(refresh, bwd, miter, fused):
        lenv.rebuild_solver(refresh=refresh, bwd_mode=bwd, max_iter=miter,
                            fused=bool(fused))

        def run(us):
            state, obs = lenv.reset(keys)

            def body(carry, u):
                st, _ = carry
                st, obs2, r, d, info = lenv.step(st, u)
                return (st, obs2), (st.sim.q, r)

            (_, _), (qs, rs) = jax.lax.scan(body, (state, obs), us)
            return qs, jnp.sum(rs)

        return (jax.jit(run),
                jax.jit(jax.grad(lambda uu: run(uu)[1])))

    run_ref, grad_ref = build(1, "exact", args.ref_iters, 0)
    t0 = time.time()
    qs_ref, _ = run_ref(us)
    g_ref = np.asarray(grad_ref(us))
    qs_ref = np.asarray(qs_ref)
    print(f"# reference built in {time.time() - t0:.0f}s", flush=True)

    os.makedirs("artifacts", exist_ok=True)
    outpath = "artifacts/SOLVER_ACCURACY_r04.jsonl"
    out = []
    for cfg in args.configs:
        refresh, bwd, miter, fused = cfg.split(":")
        run_m, grad_m = build(int(refresh), bwd, int(miter), int(fused))
        qs, _ = run_m(us)
        qs = np.asarray(qs)
        g = np.asarray(grad_m(us))
        rel = float(np.sqrt(np.mean((qs - qs_ref) ** 2))
                    / (np.sqrt(np.mean(qs_ref ** 2)) + 1e-30))
        cos = float(np.dot(g.ravel(), g_ref.ravel())
                    / (np.linalg.norm(g) * np.linalg.norm(g_ref) + 1e-300))
        # per-seed cosines for the min
        cos_seeds = []
        for b in range(B):
            gb, rb = g[:, b].ravel(), g_ref[:, b].ravel()
            cos_seeds.append(float(
                np.dot(gb, rb)
                / (np.linalg.norm(gb) * np.linalg.norm(rb) + 1e-300)))
        rec = {
            "metric": f"lane_solver_refresh{refresh}_{bwd}_iter{miter}"
                      f"_fused{fused}",
            "unit": f"vs refresh=1/exact/iter={args.ref_iters} "
                    f"(TactilePush H={H}, B={B}, obs={args.obs}, "
                    f"{jax.devices()[0].device_kind}, "
                    f"{jnp.zeros(1).dtype})",
            "traj_rel_rmse": rel,
            "grad_cos": cos,
            "grad_cos_min_seed": float(np.min(cos_seeds)),
        }
        print(json.dumps(rec), flush=True)
        with open(outpath, "a") as fp:
            fp.write(json.dumps(rec) + "\n")
        out.append(rec)
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
