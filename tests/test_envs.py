"""TactilePush functional env tests: shapes, determinism, vmap batching,
reward-component parity with the reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.envs import tactile_push

pytestmark = pytest.mark.slow  # compile-bound: minutes on the CPU mesh


@pytest.fixture(scope="module")
def env():
    return tactile_push.make("tactile_flatten")


def test_reset_and_step_shapes(env):
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (3 + 13 * 10 * 3,)
    state2, obs2, r, d, info = jax.jit(env.step)(state, jnp.zeros(3))
    assert obs2.shape == obs.shape
    assert np.isfinite(float(r))
    assert not bool(d)
    for k in ("reward_pos", "reward_rot", "reward_touch", "reward_action"):
        assert k in info
    # reward decomposition sums to the total
    total = sum(float(info[k]) for k in
                ("reward_pos", "reward_rot", "reward_touch", "reward_action"))
    np.testing.assert_allclose(total, float(r), rtol=1e-9)


def test_reset_determinism_and_randomization(env):
    s1, o1 = jax.jit(env.reset)(jax.random.PRNGKey(7))
    s2, o2 = jax.jit(env.reset)(jax.random.PRNGKey(7))
    s3, o3 = jax.jit(env.reset)(jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # goals differ across seeds
    assert not np.allclose(np.asarray(s1.extras.goal), np.asarray(s3.extras.goal))
    # goal ranges (reference :144-146)
    g = np.asarray(s1.extras.goal)
    assert 0.15 <= g[0] <= 0.25 and -0.2 <= g[1] <= 0.2


def test_vmap_batched_episodes(env):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    assert obs.shape == (3, 3 + 390)
    actions = jnp.zeros((3, 3))
    states2, obs2, r, d, info = jax.jit(jax.vmap(env.step))(states, actions)
    assert r.shape == (3,)
    assert np.all(np.isfinite(np.asarray(r)))
    # different goals -> different rewards
    assert len(np.unique(np.asarray(r))) == 3


def test_bptt_action_gradients_nonzero(env):
    """d(reward)/d(action) flows through 5 implicit sim substeps."""
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))

    def f(u):
        _, _, r, _, _ = env.step(state, u)
        return r

    g = jax.jit(jax.grad(f))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.linalg.norm(np.asarray(g)) > 0


def test_privilege_obs(env):
    env_p = tactile_push.TactilePushEnv(env.struct, env.model, "privilege")
    state, obs = jax.jit(env_p.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (6,)
