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
    ], help="refresh:bwd:max_iter:fused (refresh=0 = amortized per-env-step)")
    ap.add_argument("--x64", action="store_true",
                    help="run on CPU in float64 — the chaos-free closure "
                         "regime (VERDICT r4 ask #4: validate the SHIPPED "
                         "amortized config where stick-slip noise cannot "
                         "mask adjoint error)")
    ap.add_argument("--fd", type=int, default=0,
                    help="ALSO finite-difference-check each config's own "
                         "gradient along this many random control "
                         "directions (central differences)")
    ap.add_argument("--out", default="artifacts/SOLVER_ACCURACY_r04.jsonl")
    args = ap.parse_args()

    import jax
    if args.x64:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
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
        # mega=False: this study measures the lanes stepper configs; the
        # mega program is pinned to lanes refresh=0/exact separately by
        # tests/test_megastep.py
        lenv.rebuild_solver(refresh=refresh, bwd_mode=bwd, max_iter=miter,
                            fused=bool(fused), mega=False)

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
    outpath = args.out
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
        fd_rows = []
        if args.fd:
            # central-difference closure of THIS config's own gradient:
            # AD(run_m) must match FD(run_m) regardless of solver staleness
            # (the adjoint must be the true derivative of the computed map)
            rng = np.random.RandomState(11)
            eps = 1e-6 if args.x64 else 1e-3
            loss_m = jax.jit(lambda uu: run_m(uu)[1])
            for di in range(args.fd):
                d = rng.randn(*us.shape)
                d /= np.linalg.norm(d)
                d_j = jnp.asarray(d, us.dtype)
                fp_ = float(loss_m(us + eps * d_j))
                fm_ = float(loss_m(us - eps * d_j))
                fd_val = (fp_ - fm_) / (2 * eps)
                ad_val = float(np.dot(g.ravel(), d.ravel()))
                fd_rows.append({"fd": fd_val, "ad": ad_val,
                                "rel_err": abs(fd_val - ad_val)
                                / (abs(fd_val) + 1e-300)})
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
        if fd_rows:
            rec["fd_check"] = fd_rows
            rec["fd_rel_err_max"] = max(r["rel_err"] for r in fd_rows)
        print(json.dumps(rec), flush=True)
        with open(outpath, "a") as fp:
            fp.write(json.dumps(rec) + "\n")
        out.append(rec)
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
