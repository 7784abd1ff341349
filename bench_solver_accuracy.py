"""Chord-iteration budget accuracy study — trajectories AND gradients.

The implicit substep runs a fixed-trip chord iteration (integrators._newton /
lanes._newton). Its cost is linear in ``solver_max_iter`` but warm starts
(substep-to-substep) make late iterations redundant. Two questions decide the
shipped budget:

1. *Trajectory*: q-RMSE of a full TactilePush episode vs a converged
   (max_iter=30) reference — now averaged over multiple seeds/control
   sequences (round-2 advisor: a single-seed study is contact-chaos noise).
2. *Gradient*: the IFT custom VJP assumes the forward solve converged
   ("exact Jacobian at the converged solution"). At a truncated budget the
   premise weakens two ways, both measured here per budget m:
   - self-consistency: analytic grad(L_m) vs central finite differences of
     the SAME truncated dynamics L_m (sampled control dims) — is the VJP
     still the true derivative of what we actually simulate?
   - fidelity: grad(L_m) vs grad(L_30) — does truncation bias the direction?
   Methodology mirrors the reference's GD.test_simple_gradient
   (/root/reference/algorithms/gd.py:407-468).

Run: python bench_solver_accuracy.py [--horizon 50] [--iters 2 4 6 10]
     [--seeds 4] [--fd-dims 8]
Prints one JSON line per budget; appends to artifacts/SOLVER_ACCURACY_r03.jsonl.
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
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--fd-dims", type=int, default=8)
    ap.add_argument("--fd-eps", type=float, default=1e-6)
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

    H = args.horizon

    def build(max_iter):
        from tactilesimulation_tpu.sim import integrators
        env = tactile_push.make("no_tactile")
        env.struct = dataclasses.replace(env.struct,
                                         solver_max_iter=max_iter)
        env._step_sim = integrators.build_step(env.struct)

        def run(key, us):
            state, obs = env.reset(key)

            def body(carry, u):
                st, _ = carry
                st, obs2, r, d, info = env.step(st, u)
                return (st, obs2), (st.sim.q, r)

            (_, _), (qs, rs) = jax.lax.scan(body, (state, obs), us)
            return qs, jnp.sum(rs)

        loss = lambda key, us: run(key, us)[1]
        return (jax.jit(run), jax.jit(jax.grad(loss, argnums=1)),
                jax.jit(loss), env.ndof_u)

    run_ref, grad_ref, loss_ref, nu = build(args.ref_iters)

    seeds = list(range(args.seeds))
    keys = [jax.random.PRNGKey(1000 + s) for s in seeds]
    uss = [0.3 * jax.random.normal(jax.random.PRNGKey(7 + s), (H, nu))
           for s in seeds]

    refs = [run_ref(k, u) for k, u in zip(keys, uss)]
    g_refs = [np.asarray(grad_ref(k, u)) for k, u in zip(keys, uss)]

    rng = np.random.default_rng(0)
    fd_idx = rng.choice(H * nu, size=min(args.fd_dims, H * nu), replace=False)

    os.makedirs("artifacts", exist_ok=True)
    outpath = "artifacts/SOLVER_ACCURACY_r03.jsonl"
    out = []
    for mi in args.iters:
        run_m, grad_m, loss_m, _ = build(mi)
        rels, cos_ref, cos_fd, relerr_fd = [], [], [], []
        for s, (k, us) in enumerate(zip(keys, uss)):
            qs, _ = run_m(k, us)
            q_ref = np.asarray(refs[s][0])
            rmse = float(np.sqrt(np.mean((np.asarray(qs) - q_ref) ** 2)))
            rels.append(rmse / (float(np.sqrt(np.mean(q_ref ** 2))) + 1e-30))
            g = np.asarray(grad_m(k, us))
            gr = g_refs[s]
            cos_ref.append(float(
                np.dot(g.ravel(), gr.ravel())
                / (np.linalg.norm(g) * np.linalg.norm(gr) + 1e-300)))
            # FD self-consistency on sampled dims (same truncated dynamics)
            g_fd, g_an = [], []
            for idx in fd_idx:
                e = np.zeros(H * nu)
                e[idx] = args.fd_eps
                e = jnp.asarray(e.reshape(H, nu))
                lp = float(loss_m(k, us + e))
                lm = float(loss_m(k, us - e))
                g_fd.append((lp - lm) / (2 * args.fd_eps))
                g_an.append(float(g.reshape(-1)[idx]))
            g_fd, g_an = np.asarray(g_fd), np.asarray(g_an)
            cos_fd.append(float(
                np.dot(g_fd, g_an)
                / (np.linalg.norm(g_fd) * np.linalg.norm(g_an) + 1e-300)))
            relerr_fd.append(float(np.linalg.norm(g_fd - g_an)
                                   / (np.linalg.norm(g_fd) + 1e-300)))
        rec = {
            "metric": f"chord_budget_{mi}",
            "unit": f"vs max_iter={args.ref_iters} "
                    f"(TactilePush H={H}, f64, {args.seeds} seeds)",
            "traj_rel_rmse_mean": float(np.mean(rels)),
            "traj_rel_rmse_max": float(np.max(rels)),
            "grad_cos_vs_ref_mean": float(np.mean(cos_ref)),
            "grad_cos_vs_ref_min": float(np.min(cos_ref)),
            "grad_cos_vs_fd_mean": float(np.mean(cos_fd)),
            "grad_cos_vs_fd_min": float(np.min(cos_fd)),
            "grad_relerr_vs_fd_mean": float(np.mean(relerr_fd)),
        }
        print(json.dumps(rec), flush=True)
        with open(outpath, "a") as fp:
            fp.write(json.dumps(rec) + "\n")
        out.append(rec)
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
