"""TPU A/B: gradient of the bench loss, megastep vs lanes stepper (f32)."""
import jax, jax.numpy as jnp
import numpy as np

from tactilesimulation_tpu.envs import tactile_push

B, H = 128, 20

def make_fn(mega):
    env = tactile_push.make("no_tactile")
    lenv = env.lane_env()
    lenv.rebuild_solver(refresh=0, bwd_mode="exact", max_iter=0,
                        mega=("auto" if mega else False))
    print("mega =", lenv.solver_mega)

    def batch_loss(us_batch, keys):
        state, obs = lenv.reset(keys)
        def body(carry, u):
            st, _ = carry
            st, obs, r, d, info = lenv.step(st, u)
            return (st, obs), r
        (_, _), rewards = jax.lax.scan(body, (state, obs), us_batch)
        return jnp.mean(jnp.sum(rewards, axis=0))
    return jax.jit(jax.value_and_grad(batch_loss)), env.ndof_u

fn_m, nu = make_fn(True)
fn_l, _ = make_fn(False)
keys = jax.random.split(jax.random.PRNGKey(0), B)
us = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (H, B, nu))
lm, gm = jax.device_get(fn_m(us, keys))
ll, gl = jax.device_get(fn_l(us, keys))
gm, gl = np.asarray(gm).ravel(), np.asarray(gl).ravel()
cos = float(np.dot(gm, gl) / (np.linalg.norm(gm) * np.linalg.norm(gl)))
rel = float(np.linalg.norm(gm - gl) / np.linalg.norm(gl))
print(f"loss mega={lm:.6f} lanes={ll:.6f} dloss_rel={abs(lm-ll)/abs(ll):.3e}")
print(f"grad cos={cos:.6f} relerr={rel:.3e} |g|={np.linalg.norm(gl):.3e}")
