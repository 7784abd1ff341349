"""Chord-budget evidence for the non-TactilePush scenes (VERDICT r3 weak #2).

StableGrasp / TactileInsertion / DClaw ship ``solver_max_iter`` values that
round 3 never backed with data. This study pins, per scene and budget m:

- trajectory: q-RMSE of a T-substep rollout (neutral PD-hold controls plus a
  small sinusoidal excitation that engages contact) vs a converged
  (max_iter=30) reference;
- gradient: cosine of d(sum q_T^2 + sum tactile^2)/d(controls) vs the
  converged solver — the BPTT quantity EpisodicSimFunction-style training
  differentiates (reference envs/redmax_torch_functions.py:70-109).

Run (CPU f64 — tight tolerances):
    python bench_solver_accuracy_scenes.py [--scenes stable_grasp ...]
Appends JSON lines to artifacts/SOLVER_ACCURACY_SCENES_r04.jsonl.
"""

import argparse
import dataclasses
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+",
                    default=["stable_grasp", "tactile_insertion", "dclaw"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--iters", type=int, nargs="+", default=[4, 6, 8])
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

    from tactilesimulation_tpu.model import task_scenes
    from tactilesimulation_tpu.sim import dynamics, integrators

    os.makedirs("artifacts", exist_ok=True)
    outpath = "artifacts/SOLVER_ACCURACY_SCENES_r04.jsonl"
    out = []
    for scene in args.scenes:
        struct0, model = getattr(task_scenes, scene)()
        T = args.steps
        nu = struct0.ndof_u
        dof = np.asarray(struct0.motor_dof)
        pos_mask = np.asarray(model.motor_pos_mask)
        base_u = np.where(pos_mask > 0, np.asarray(model.q_init)[dof], 0.0)
        t = np.arange(T)[:, None]
        us = jnp.asarray(
            base_u[None] + 0.05 * np.sin(0.1 * t + np.arange(nu)[None]))

        def build(miter):
            struct = dataclasses.replace(struct0, solver_max_iter=miter)
            step = integrators.build_step(struct)

            def run(us):
                state = integrators.initial_state(struct, model)

                def body(s, u):
                    s2 = step(model, s, u)
                    return s2, s2.q

                state, qs = jax.lax.scan(body, state, us)
                tac = dynamics.tactile_field(struct, model, state.q,
                                             state.qdot)
                return qs, jnp.sum(state.q ** 2) + jnp.sum(tac ** 2)

            return (jax.jit(run),
                    jax.jit(jax.grad(lambda uu: run(uu)[1])))

        run_ref, grad_ref = build(args.ref_iters)
        qs_ref = np.asarray(run_ref(us)[0])
        g_ref = np.asarray(grad_ref(us))

        for mi in args.iters:
            run_m, grad_m = build(mi)
            qs = np.asarray(run_m(us)[0])
            g = np.asarray(grad_m(us))
            rel = float(np.sqrt(np.mean((qs - qs_ref) ** 2))
                        / (np.sqrt(np.mean(qs_ref ** 2)) + 1e-30))
            cos = float(np.dot(g.ravel(), g_ref.ravel())
                        / (np.linalg.norm(g) * np.linalg.norm(g_ref)
                           + 1e-300))
            rec = {
                "metric": f"{scene}_chord_budget_{mi}",
                "unit": f"vs max_iter={args.ref_iters} "
                        f"({T} substeps, f64, CPU)",
                "shipped_budget": struct0.solver_max_iter,
                "traj_rel_rmse": rel,
                "grad_cos_vs_ref": cos,
            }
            print(json.dumps(rec), flush=True)
            with open(outpath, "a") as fp:
                fp.write(json.dumps(rec) + "\n")
            out.append(rec)
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
