"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md north star): batched differentiable rollouts per
second per chip on TactilePush at H = 150 env steps (frame_skip 5 => 750
implicit sim steps per rollout), including the backward pass (the rollout is
differentiated w.r.t. the control sequence, i.e. the full BPTT path the GD
trainer uses). ``vs_baseline`` is measured against the 1000 rollouts/s/chip
target.

Run: python bench.py [--batch N] [--horizon H] [--forward-only]
"""

import argparse
import json
import os
import sys
import time

import jax

# persistent compile cache: XLA compiles of the long-horizon BPTT graph are
# expensive; cache them across bench invocations
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=150)
    ap.add_argument("--forward-only", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the step in the backward pass instead "
                         "of storing per-substep residuals. Measured on TPU "
                         "v5e: SLOWER (17.5 vs 27.6 rollouts/s at B=1024) — "
                         "this graph is dispatch-latency-bound, not "
                         "HBM-bound — and faults the device at B=4096")
    ap.add_argument("--max-iter", type=int, default=0,
                    help="override the scene's Newton/chord iteration count")
    ap.add_argument("--refresh", type=int, default=0,
                    help="chord-LU refresh period in substeps (0 = once per "
                         "env step — the amortized default; 1 = per substep)")
    ap.add_argument("--bwd", default="exact",
                    choices=("exact", "fwdfac", "refine", "refine5", "stale"),
                    help="IFT adjoint: 'exact' (default) rebuilds the "
                         "at-solution Jacobian in the backward; 'fwdfac' "
                         "factors it in the forward pass (measured slower: "
                         "174 vs 194 r/s); 'stale'/'refine' are A/B only "
                         "(grad cos 0.39/0.37)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="substep-loop unroll factor (1..frame_skip)")
    ap.add_argument("--vmap", action="store_true",
                    help="legacy path: vmap of the per-episode env instead of "
                         "the lane-major (batch-last) core. Kept for A/B "
                         "comparison — measured 36x slower at B=1024 on TPU "
                         "v5e (the (B, 3)-minor-axis layout uses 3-7 of 128 "
                         "VPU lanes; see sim/lanes.py)")
    ap.add_argument("--no-mega", action="store_true",
                    help="disable the whole-env-step fused Pallas program "
                         "(ops/megastep.py) and use the lanes stepper")
    ap.add_argument("--obs", default="no_tactile",
                    help="TactilePush observation type (tactile_flatten "
                         "exercises the dense marker-field query each step)")
    args = ap.parse_args()

    import dataclasses

    from tactilesimulation_tpu.envs import tactile_push

    env = tactile_push.make(args.obs)
    env.substep_unroll = args.unroll
    if args.max_iter:
        env.struct = dataclasses.replace(env.struct,
                                         solver_max_iter=args.max_iter)
        from tactilesimulation_tpu.sim import integrators
        env._step_sim = integrators.build_step(env.struct)
    B, H = args.batch, args.horizon

    if args.vmap:
        def rollout_reward(us, key):
            """Total reward of one episode driven by an explicit control
            sequence us (H, ndof_u) — the GD/BPTT workload shape."""
            state, obs = env.reset(key)

            def body(carry, u):
                st, _ = carry
                st, obs, r, d, info = env.step(st, u)
                return (st, obs), r

            if args.remat:
                body = jax.checkpoint(body)
            (_, _), rewards = jax.lax.scan(body, (state, obs), us)
            return jnp.sum(rewards)

        def batch_loss(us_batch, keys):
            return jnp.mean(jax.vmap(rollout_reward)(us_batch, keys))
    else:
        lenv = env.lane_env()
        lenv.struct = env.struct
        lenv.rebuild_solver(refresh=args.refresh, bwd_mode=args.bwd,
                            max_iter=args.max_iter,
                            mega=(False if args.no_mega else "auto"))
        print(f"# solver: mega={lenv.solver_mega}", file=sys.stderr)

        def batch_loss(us_batch, keys):
            """us_batch (H, B, ndof_u): whole batch stepped lane-major.

            The per-step observation feeds the loss with a tiny weight so
            XLA cannot dead-code-eliminate the observation path — with
            --obs tactile_flatten this forces the dense marker-field query
            (and its gradient) into every step, the GD-trainer workload."""
            state, obs = lenv.reset(keys)

            def body(carry, u):
                st, _ = carry
                st, obs, r, d, info = lenv.step(st, u)
                obs_term = sum(jnp.sum(o ** 2) for o in jax.tree.leaves(obs))
                return (st, obs), r + 1e-12 * obs_term

            if args.remat:
                body = jax.checkpoint(body)
            (_, _), rewards = jax.lax.scan(body, (state, obs), us_batch)
            return jnp.mean(jnp.sum(rewards, axis=0))

    if args.forward_only:
        fn = jax.jit(batch_loss)
    else:
        fn = jax.jit(jax.grad(batch_loss))

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    us_shape = (B, H, env.ndof_u) if args.vmap else (H, B, env.ndof_u)
    us = 0.1 * jax.random.normal(jax.random.PRNGKey(1), us_shape)

    out = fn(us, keys)  # compile
    jax.device_get(out)
    # sanity guard: a faulted/unhealthy device can return instantly with
    # garbage — never report a throughput number for a wrong computation
    checksum = float(jax.tree.reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), out, jnp.zeros(())))
    if not (checksum > 0 and checksum < float("inf")):
        print(json.dumps({"metric": "diff_rollouts_per_s_per_chip",
                          "value": None, "unit": "INVALID: gradient checksum "
                          f"= {checksum}", "vs_baseline": None}))
        return None

    times = []
    for rep in range(args.repeats):
        # fresh RANDOM perturbation per repeat: the axon remote executor
        # memoizes (program, inputs) pairs and would otherwise serve cached
        # results at RPC latency (the round-3 rolling-ball 333k FPS
        # artifact). A constant offset is NOT enough — `x + 1e-8` is a
        # float32 no-op for |x| >~ 0.27 (advisor r04), so each repeat gets
        # an O(1e-3) random perturbation that provably changes the bits.
        us = us + 1e-3 * jax.random.normal(jax.random.PRNGKey(100 + rep),
                                           us.shape)
        jax.device_get(us)
        t0 = time.time()
        out = fn(us, keys)
        # device_get, NOT block_until_ready: through the axon tunnel
        # block_until_ready can return before execution completes (measured:
        # a 1.1 s rollout "blocked" in 0.6 ms) — only a host transfer
        # reliably fences. The fetched gradient is ~2 MB; transfer cost is
        # noise at these timescales.
        jax.device_get(out)
        times.append(time.time() - t0)

    # median of the later repeats (warm steady state), not min: min is
    # maximally sensitive to a single cached/under-fenced repeat
    tail = sorted(times[1:] if len(times) > 1 else times)
    med = tail[len(tail) // 2]
    rps = B / med
    target = 1000.0
    result = {
        "metric": ("fwd_rollouts_per_s_per_chip" if args.forward_only
                   else "diff_rollouts_per_s_per_chip"),
        "value": round(rps, 2),
        "unit": f"rollouts/s (TactilePush H={H}, batch={B}, "
                f"{jax.devices()[0].device_kind})",
        "vs_baseline": round(rps / target, 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
