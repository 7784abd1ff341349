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


def test_dclaw_reference_assets_episode():
    """End-to-end on the ORIGINAL reference scene assets (VERDICT r2 #7):
    dclaw_position_control.xml + mesh-vertex contact point clouds
    (contacts/*.txt) + the abstract tactile spec
    (tactile/dclaw_fingertip_tactile.txt). Verifies the episode SIMULATES —
    including nonzero tactile flow at a cap-touching pose — not just parses."""
    from tactilesimulation_tpu.envs import dclaw_rotate
    path = ("/root/reference/envs/assets/dclaw_rotate/"
            "dclaw_position_control.xml")
    env = dclaw_rotate.make("tactile", scene_path=path)
    assert env.struct.ndof_q == 10 and env.struct.ndof_tactile == 3 * 3 * 302
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (18 + 3 * 20 * 20 * 3,)
    assert np.all(np.isfinite(np.asarray(obs)))

    # at the reference init pose ([*, -0.5, 0.8] per finger,
    # dclaw_rotate_env.py:76-77) the fingertip pads REST ON the cap
    # (~13 mm max SDF penetration at cap radius 0.08) — pin the cap DR to
    # radius 0.08 / joint z 0.075 (the reference reset's own DR ranges,
    # env :169-178) to make the contact deterministic
    dtype = state.sim.q.dtype
    ex = state.extras
    cap_b = env._cap_body
    ex = ex.replace(
        body_size=ex.body_size.at[cap_b, 0].set(jnp.asarray(0.08, dtype)),
        joint_pos=ex.joint_pos.at[env._cap_joint].set(
            jnp.asarray([0.0, 0.0, 0.075], dtype)))
    q = jnp.asarray(np.array([0.0, -0.5, 0.8] * 3 + [0.0]), dtype)
    state = state.replace(sim=state.sim.replace(q=q, q_prev=q),
                          extras=ex)
    model = env._model_for(ex)
    imgs = env._flow_images(model, q, jnp.zeros_like(q))
    flow = float(jnp.sum(jnp.abs(imgs)))
    assert flow > 0, "no tactile flow at the cap-touching pose"

    # 10 dynamic steps holding the pose: finite physics, flow persists
    step = jax.jit(env.step)
    for i in range(10):
        state, obs, r, d, info = step(state, jnp.zeros(9))
        assert np.isfinite(float(r))
        assert np.all(np.isfinite(np.asarray(state.sim.q)))
    assert float(jnp.sum(jnp.abs(state.extras.tactile_imgs))) > 0
