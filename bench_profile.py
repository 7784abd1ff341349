"""Hot-path dissection on the real TPU: where does the substep time go?

Measures batched env.step at several batch sizes (latency- vs throughput-
bound?), the effect of the Newton/chord iteration count, and the per-residual
cost. Prints one line per experiment as it completes.

Run: python bench_profile.py
"""

import dataclasses
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tactilesimulation_tpu.envs import tactile_push
from tactilesimulation_tpu.sim import dynamics, integrators


def timeit(fn, *args, repeats=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    env = tactile_push.make("no_tactile")
    struct, model = env.struct, env.model
    key = jax.random.PRNGKey(0)

    def report(name, t, B):
        print(f"{name}: {t*1e3:.2f} ms  "
              f"(fwd rollouts/s @H=150 if env.step: {B/(t*150):.1f})",
              flush=True)

    # batch scaling of env.step
    for B in (1024, 256, 4096):
        keys = jax.random.split(key, B)
        states = jax.vmap(lambda k: env.reset(k)[0])(keys)
        u = jnp.zeros((B, env.ndof_u))
        stepb = jax.jit(jax.vmap(lambda s, a: env.step(s, a)[0]))
        t = timeit(stepb, states, u)
        report(f"env.step B={B} max_iter=10", t, B)

    # iteration-count effect at B=1024
    B = 1024
    keys = jax.random.split(key, B)
    states = jax.vmap(lambda k: env.reset(k)[0])(keys)
    u = jnp.zeros((B, env.ndof_u))
    for it in (4, 2):
        env2 = tactile_push.make("no_tactile")
        env2.struct = dataclasses.replace(env2.struct, solver_max_iter=it)
        env2._step_sim = integrators.build_step(env2.struct)
        stepb = jax.jit(jax.vmap(lambda s, a: env2.step(s, a)[0]))
        t = timeit(stepb, states, u)
        report(f"env.step B={B} max_iter={it}", t, B)

    # single residual eval at B=1024
    residual_fn = integrators.make_residual(struct)
    nu = len(struct.motor_dof)
    p0 = jax.vmap(lambda q, qd: dynamics.momentum(struct, model, q, qd))(
        states.sim.q, states.sim.qdot)
    inputs = integrators.StepInputs(
        model=model, u=jnp.zeros((B, nu)), q_base=states.sim.q,
        p_base=p0, gamma=jnp.full((B,), model.h))
    in_axes = (0, integrators.StepInputs(model=None, u=0, q_base=0,
                                         p_base=0, gamma=0))
    res_b = jax.jit(jax.vmap(residual_fn, in_axes=in_axes))
    t = timeit(res_b, states.sim.qdot, inputs)
    report(f"residual B={B}", t, B)

    # gradient step (the bench workload shape) at small horizon H=10
    def rollout(us, k):
        st, _ = env.reset(k)
        def body(c, uu):
            s2, _, r, _, _ = env.step(c, uu)
            return s2, r
        _, rs = jax.lax.scan(body, st, us)
        return jnp.sum(rs)
    gfn = jax.jit(jax.grad(lambda us, ks:
                           jnp.mean(jax.vmap(rollout)(us, ks))))
    us = jnp.zeros((B, 10, env.ndof_u))
    t = timeit(gfn, us, keys, repeats=3)
    print(f"grad rollout H=10 B={B}: {t*1e3:.2f} ms  "
          f"(diff rollouts/s scaled to H=150: {B/(t*15):.1f})", flush=True)


if __name__ == "__main__":
    main()
