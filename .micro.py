import time, jax, jax.numpy as jnp, numpy as np
from tactilesimulation_tpu.envs import tactile_push, tactile_push_lanes

B = 1024
env = tactile_push.make("no_tactile")
lenv = tactile_push_lanes.TactilePushLanes(env)
keys = jax.random.split(jax.random.PRNGKey(0), B)
u = 0.1*jax.random.normal(jax.random.PRNGKey(1), (B, env.ndof_u))

# vmap path
reset_v = jax.jit(jax.vmap(env.reset))
step_v = jax.jit(jax.vmap(env.step))
t0=time.time(); sv, ov = reset_v(keys); jax.block_until_ready(sv); print("vmap reset compile", time.time()-t0)
t0=time.time(); out_v = step_v(sv, u); jax.block_until_ready(out_v); print("vmap step compile", time.time()-t0)
t0=time.time()
for _ in range(20): out_v = step_v(sv, u)
jax.block_until_ready(out_v); print("vmap step x20", time.time()-t0)

# lane path
reset_l = jax.jit(lenv.reset)
step_l = jax.jit(lenv.step)
t0=time.time(); sl, ol = reset_l(keys); jax.block_until_ready(sl); print("lane reset compile", time.time()-t0)
t0=time.time(); out_l = step_l(sl, u); jax.block_until_ready(out_l); print("lane step compile", time.time()-t0)
t0=time.time()
for _ in range(20): out_l = step_l(sl, u)
jax.block_until_ready(out_l); print("lane step x20", time.time()-t0)

# parity (f32 on TPU)
print("q diff", float(jnp.max(jnp.abs(out_l[0].sim.q.T - out_v[0].sim.q))))
print("rew diff", float(jnp.max(jnp.abs(out_l[2] - out_v[2]))))
print("obs diff", float(jnp.max(jnp.abs(out_l[1] - out_v[1]))))
