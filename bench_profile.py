"""Hot-path dissection on the real TPU: where does the substep time go?

Round-3 version, tunnel-aware: the axon TPU tunnel adds a ~24 ms per-program
dispatch floor, so naive per-op timing is meaningless. Every component here
is measured as ONE jitted program that runs the component K times in a
sequential ``lax.fori_loop`` (data-dependent chaining defeats DCE), and the
per-iteration time is (total - floor) / K. Results go to
artifacts/PROFILE_r03.json; --trace additionally dumps an XLA op trace.

Run: python bench_profile.py [--trace] [--obs no_tactile|tactile_flatten]
"""

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tactilesimulation_tpu.envs import tactile_push
from tactilesimulation_tpu.sim import lanes

RESULTS = {}
FLOOR_S = [0.0]


def timeit_raw(fn, *args, repeats=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def timeit_looped(make_body, init, K=100, repeats=8):
    """make_body: () -> body(i, carry) -> carry. Returns per-iteration secs.

    Times the loop at K and 2K trips and differences them — cancels the
    tunnel dispatch floor exactly (both programs pay it once)."""

    def prog_k(c0):
        return jax.lax.fori_loop(0, K, make_body(), c0)

    def prog_2k(c0):
        return jax.lax.fori_loop(0, 2 * K, make_body(), c0)

    tk = timeit_raw(jax.jit(prog_k), init, repeats=repeats)
    t2k = timeit_raw(jax.jit(prog_2k), init, repeats=repeats)
    return max(t2k - tk, 1e-9) / K


def report(name, t_iter, B=None, per=None):
    RESULTS[name] = {"ms": round(t_iter * 1e3, 4)}
    extra = ""
    if B is not None and per is not None:
        RESULTS[name]["rps_if_dominant"] = round(B / (t_iter * per), 1)
        extra = f"  (rollouts/s if this ran 1x per {per}: {B/(t_iter*per):.1f})"
    print(f"{name}: {t_iter*1e3:.3f} ms{extra}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--obs", default="no_tactile")
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    env = tactile_push.make(args.obs)
    lenv = env.lane_env()
    struct, model = env.struct, env.model
    B = args.batch
    H, FS = 150, env.frame_skip           # bench.py protocol
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, B)

    state, obs = jax.jit(lenv.reset)(keys)
    u6 = jnp.zeros((6, B))
    n = state.sim.q.shape[0]

    # dispatch floor: trivial program
    FLOOR_S[0] = timeit_raw(jax.jit(lambda x: x + 1.0), jnp.zeros(()))
    print(f"dispatch floor: {FLOOR_S[0]*1e3:.2f} ms", flush=True)
    RESULTS["dispatch_floor_ms"] = round(FLOOR_S[0] * 1e3, 3)
    RESULTS["config"] = {"n": n, "B": B, "frame_skip": FS,
                         "max_iter": struct.solver_max_iter,
                         "obs": args.obs,
                         "device": str(jax.devices()[0].device_kind)}

    residual_fn = lanes.make_residual(struct)
    from tactilesimulation_tpu.sim.lanes import StepInputs
    p0 = lanes.momentum(struct, model, state.sim.q, state.sim.qdot)
    inputs = StepInputs(model=model, u=u6, q_base=state.sim.q, p_base=p0,
                        gamma=jnp.full((1, 1), model.h))
    v0 = state.sim.qdot

    # --- momentum ----------------------------------------------------------
    def mom_body():
        def body(i, v):
            return lanes.momentum(struct, model, state.sim.q, v) * 1e-3
        return body

    report("momentum", timeit_looped(mom_body, v0), B, per=H * FS)

    # --- residual ----------------------------------------------------------
    def res_body():
        def body(i, v):
            return residual_fn(v, inputs) * 1e-3
        return body

    report("residual", timeit_looped(res_body, v0), B,
           per=H * FS * (struct.solver_max_iter + 1))

    # --- jacobian (linearize + n tangents) ----------------------------------
    eye_t = jnp.broadcast_to(jnp.eye(n)[:, :, None], (n, n, B))

    def jac_once(v):
        r0, lin = jax.linearize(lambda vv: residual_fn(vv, inputs), v)
        Jc = jax.vmap(lin)(eye_t.astype(v.dtype))
        return r0, jnp.swapaxes(Jc, 0, 1)

    def jac_body():
        def body(i, v):
            r0, J = jac_once(v)
            return v + 1e-9 * (r0 + jnp.sum(J, axis=1))
        return body

    report("jacobian_linearize", timeit_looped(jac_body, v0), B, per=H * FS)

    # --- factor + one solve --------------------------------------------------
    J0 = jax.jit(jac_once)(v0)[1]

    def fac_body():
        def body(i, r):
            lu = lanes.gauss_factor(lanes._ridge(J0 + 1e-12 * jnp.sum(r)))
            return lanes.gauss_solve(lu, r)
        return body

    report("gauss_factor+solve", timeit_looped(fac_body, jnp.ones((n, B))),
           B, per=H * FS)

    # --- chord iteration body (solve + residual) ------------------------------
    lu0 = jax.jit(lambda J: lanes.gauss_factor(lanes._ridge(J)))(J0)

    def chord_body():
        def body(i, carry):
            v, r = carry
            dv = lanes.gauss_solve(lu0, r)
            v2 = v - 1e-3 * dv
            return v2, residual_fn(v2, inputs)
        return body

    t = timeit_looped(chord_body, (v0, jax.jit(residual_fn)(v0, inputs)))
    report("chord_iter(solve+residual)", t, B,
           per=H * FS * struct.solver_max_iter)

    # --- full substep fwd -----------------------------------------------------
    step = lanes.build_step(struct)

    def sub_body():
        def body(i, s):
            return step(model, s, u6)
        return body

    report("lane_substep_fwd", timeit_looped(sub_body, state.sim, K=50),
           B, per=H * FS)

    # --- substep fwd+grad (BPTT unit cost) -------------------------------------
    def sub_loss(qqd, uu):
        s = state.sim._replace(q=qqd[0], qdot=qqd[1])
        s2 = step(model, s, uu)
        return jnp.sum(s2.q) * 1e-6, (s2.q, s2.qdot)

    gfn = jax.grad(sub_loss, argnums=(0, 1), has_aux=True)

    def subg_body():
        def body(i, carry):
            qqd, uu = carry
            (gq, gu), nxt = gfn(qqd, uu)
            return ((nxt[0] + 1e-9 * gq[0], nxt[1] + 1e-9 * gq[1]),
                    uu + 1e-9 * gu)
        return body

    t = timeit_looped(subg_body, ((state.sim.q, state.sim.qdot), u6), K=25)
    report("lane_substep_fwd+grad", t, B, per=H * FS)

    # --- full env step fwd ------------------------------------------------------
    uB = jnp.zeros((B, lenv.ndof_u))

    def env_body():
        def body(i, st):
            s2, o, r, d, info = lenv.step(st, uB)
            return s2
        return body

    report("env_step_fwd", timeit_looped(env_body, state, K=25), B, per=H)

    # --- batch scaling of the fwd substep ----------------------------------------
    for Bs in (256, 1024, 4096, 16384):
        ks = jax.random.split(key, Bs)
        st, _ = jax.jit(lenv.reset)(ks)
        u6s = jnp.zeros((6, Bs))

        def sb():
            def body(i, s):
                return step(model, s, u6s)
            return body

        t = timeit_looped(sb, st.sim, K=50)
        RESULTS[f"substep_fwd_B{Bs}"] = {"ms": round(t * 1e3, 4)}
        print(f"substep_fwd_B{Bs}: {t*1e3:.3f} ms "
              f"({Bs/t*1e-6:.2f}M substep-lanes/s)", flush=True)

    # --- optional XLA trace on the env-step grad ----------------------------------
    if args.trace:
        os.makedirs("artifacts", exist_ok=True)

        def es_loss(st, uu):
            _, _, r, _, _ = lenv.step(st, uu)
            return jnp.sum(r)

        gfn2 = jax.jit(jax.grad(es_loss, argnums=1))
        gfn2(state, uB).block_until_ready()
        with jax.profiler.trace("artifacts/PROFILE_r03_trace"):
            out = gfn2(state, uB)
            out.block_until_ready()
        print("trace written to artifacts/PROFILE_r03_trace", flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/PROFILE_r03.json", "w") as fp:
        json.dump(RESULTS, fp, indent=1)
    print("wrote artifacts/PROFILE_r03.json", flush=True)


if __name__ == "__main__":
    main()
