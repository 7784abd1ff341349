"""Pin the fused whole-env-step Pallas program (ops/megastep.py) against the
lanes stepper it replaces — values AND the custom IFT adjoint.

All tests run in float64 interpret mode on CPU (conftest forces the CPU
backend), where both paths are bit-comparable to round-off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.envs import tactile_push
from tactilesimulation_tpu.ops import megastep
from tactilesimulation_tpu.sim import lanes

jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def scene():
    env = tactile_push.make("no_tactile")
    return env.struct, env.model


def _rand_state(struct, model, B, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(np.asarray(model.q_init, np.float64)[:, None]
                    + 0.01 * rng.randn(struct.ndof_q, B))
    v = jnp.asarray(0.1 * rng.randn(struct.ndof_q, B))
    u = jnp.asarray(0.3 * rng.randn(struct.ndof_u, B))
    return q, v, u


def test_residual_parity(scene):
    struct, model = scene
    assert megastep.supported(struct, model)
    sc = megastep._SceneConst(struct, model)
    q, v, u = _rand_state(struct, model, B=4)
    p_base = lanes.momentum(struct, model, q, v)
    inputs = lanes.StepInputs(model=model, u=u, q_base=q, p_base=p_base,
                              gamma=jnp.full((1, 1), float(model.h), q.dtype))
    r_ref = lanes.make_residual(struct)(v, inputs)
    r_mega = sc.residual(v, u, q, p_base)
    np.testing.assert_allclose(np.asarray(r_mega), np.asarray(r_ref),
                               rtol=1e-9, atol=1e-9)
    p_mega = sc.momentum(q, v)
    np.testing.assert_allclose(np.asarray(p_mega), np.asarray(p_base),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_env_step_and_adjoint_parity(scene):
    """Forward rollout AND gradient (q0, qd0, u) parity vs
    lanes.build_env_step(refresh=0, bwd_mode='exact') — ONE env step in
    interpret mode (interpret-mode pallas is minutes/step on this 2-core
    host; the full-scale f32 A/B against the lanes path runs on the TPU in
    bench.py --no-mega)."""
    struct, model = scene
    frame_skip, miter = 5, 8
    B = 2
    q, v, u = _rand_state(struct, model, B=B, seed=1)

    ref_step = lanes.build_env_step(struct, frame_skip, refresh=0,
                                    bwd_mode="exact", max_iter=miter)
    mega_step = megastep.build_env_step_mega(struct, model, frame_skip,
                                             max_iter=miter, interpret=True)

    def loss(step_fn, q0, v0, uu):
        st = lanes.LaneSimState(q=q0, qdot=v0, q_prev=q0, qdot_prev=v0,
                                t=jnp.zeros(B, jnp.int32))
        st = step_fn(model, st, uu)
        return jnp.sum(st.q ** 2) + 0.1 * jnp.sum(st.qdot ** 2), st

    (l_ref, st_ref), g_ref = jax.value_and_grad(
        lambda *a: loss(ref_step, *a), argnums=(0, 1, 2), has_aux=True)(
            q, v, u)
    (l_mega, st_mega), g_mega = jax.value_and_grad(
        lambda *a: loss(mega_step, *a), argnums=(0, 1, 2), has_aux=True)(
            q, v, u)

    np.testing.assert_allclose(np.asarray(st_mega.q), np.asarray(st_ref.q),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_mega.qdot),
                               np.asarray(st_ref.qdot),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_mega.q_prev),
                               np.asarray(st_ref.q_prev),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(l_mega), float(l_ref), rtol=1e-9)
    for gm, gr, name in zip(g_mega, g_ref, ("q0", "qd0", "u")):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gr), rtol=2e-6, atol=1e-8,
            err_msg=f"adjoint mismatch on {name}")
