"""Full scripted-episode env tests (StableGrasp / TactileInsertion / DClaw).

Heavy: env construction runs multi-hundred-substep settles and each step is a
scripted macro-episode; cold XLA CPU compiles take tens of minutes. Run with
``pytest -m heavy tests/test_envs_heavy.py``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy


def test_stable_grasp_episode():
    from tactilesimulation_tpu.envs import stable_grasp
    env = stable_grasp.make("tactile_map")
    # settle must leave the bar level on the tables
    q_ref = np.asarray(env.q_init_ref)
    assert np.linalg.norm(q_ref[9:12]) < 0.05, "bar rotated during settle"
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (4, 13, 10)
    assert np.all(np.isfinite(np.asarray(obs)))
    # density randomization produced heterogeneous masses
    bm = np.asarray(state.extras.body_mass)
    boxes = env._box_bodies
    assert len(np.unique(bm[boxes])) > 5
    state2, obs2, r, d, info = jax.jit(env.step)(state, jnp.array([0.5]))
    assert np.isfinite(float(r))
    assert "success" in info
    # grasp position moved by action * scale
    np.testing.assert_allclose(float(state2.extras.grasp_position), 0.025,
                               atol=1e-9)


def test_tactile_insertion_episode():
    from tactilesimulation_tpu.envs import tactile_insertion
    env = tactile_insertion.make("tactile_map", domain_randomization=True,
                                 allow_rotation=True)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (2 * 2 * env.tactile_samples, 13, 10)
    assert np.all(np.isfinite(np.asarray(obs)))
    state2, obs2, r, d, info = jax.jit(env.step)(
        state, jnp.zeros(env.ndof_u))
    assert np.isfinite(float(r))
    assert "success" in info and "improve" in info


def test_dclaw_episode():
    from tactilesimulation_tpu.envs import dclaw_rotate
    env = dclaw_rotate.make("tactile")
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (18 + 3 * 20 * 20 * 3,)
    assert np.all(np.isfinite(np.asarray(obs)))
    step = jax.jit(env.step)
    for i in range(3):
        state, obs, r, d, info = step(state, 0.1 * jnp.ones(9))
        assert np.isfinite(float(r))
