"""Fused lane-major pair-wrench kernel (ops/lane_contact.py) parity.

Pins, per scene: (1) the Pallas kernel (interpret mode on the CPU mesh)
against the plain-jnp ``lanes.contact_terms`` oracle in values, (2) the jnp
twin used by the custom VJP, (3) gradients through the fused op against the
oracle, and (4) the amortized ``build_env_step`` with the fused residual
against the unfused one. Everything runs in f32 (the kernel's dtype) with
round-off tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.model import task_scenes
from tactilesimulation_tpu.ops import lane_contact
from tactilesimulation_tpu.sim import lanes


def _rand_qv(struct, model, B, seed=0, scale=0.02):
    rng = np.random.RandomState(seed)
    n = struct.ndof_q
    q = jnp.asarray(np.asarray(model.q_init, np.float64)[:, None]
                    + scale * rng.randn(n, B), jnp.float32)
    v = jnp.asarray(0.3 * rng.randn(n, B), jnp.float32)
    return q, v


SCENES = {
    "tactile_push": task_scenes.tactile_push,
    "rolling_ball_small": lambda: task_scenes.rolling_ball(resolution=8),
}


@pytest.mark.parametrize("scene", sorted(SCENES))
def test_fused_contact_matches_oracle(scene):
    struct, model = SCENES[scene]()
    model = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, model)
    q, v = _rand_qv(struct, model, B=4)
    Q0, tac0 = lanes.contact_terms(struct, model, q, v)
    pw, meta = lane_contact.make_pair_wrenches(struct, interpret=True)
    assert pw is not None

    Qf, tacf = lanes.contact_terms_fused(struct, model, q, v, pw, meta)
    sQ = float(jnp.max(jnp.abs(Q0))) + 1e-6
    assert float(jnp.max(jnp.abs(Qf - Q0))) < 3e-6 * sQ
    st = float(jnp.max(jnp.abs(tac0))) + 1e-6
    assert float(jnp.max(jnp.abs(tacf - tac0))) < 3e-6 * st

    # twin (the backward-pass function) must match too
    Qr, tacr = lanes.contact_terms_fused(struct, model, q, v,
                                         pw.reference, meta)
    assert float(jnp.max(jnp.abs(Qr - Q0))) < 3e-6 * sQ
    assert float(jnp.max(jnp.abs(tacr - tac0))) < 3e-6 * st


def test_fused_contact_gradients_match_oracle():
    struct, model = task_scenes.tactile_push()
    model = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, model)
    q, v = _rand_qv(struct, model, B=4)
    pw, meta = lane_contact.make_pair_wrenches(struct, interpret=True)

    def loss_f(q, v):
        Q, tac = lanes.contact_terms_fused(struct, model, q, v, pw, meta)
        return jnp.sum(Q ** 2) + jnp.sum(tac ** 2)

    def loss_0(q, v):
        Q, tac = lanes.contact_terms(struct, model, q, v)
        return jnp.sum(Q ** 2) + jnp.sum(tac ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1))(q, v)
    g0 = jax.grad(loss_0, argnums=(0, 1))(q, v)
    for a, b in zip(gf, g0):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) < 3e-6 * scale


def test_fused_env_step_matches_unfused():
    """Amortized env step with the fused residual == unfused residual
    (identical chord iterates to f32 round-off)."""
    struct, model = task_scenes.tactile_push()
    model = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, model)
    B, FS = 4, 5
    q, v = _rand_qv(struct, model, B=B, scale=1e-3)
    st0 = lanes.LaneSimState(q=q, qdot=0.1 * v, q_prev=q, qdot_prev=0.1 * v,
                             t=jnp.zeros(B, jnp.int32))
    u = jnp.asarray(0.3 * np.random.RandomState(3).randn(struct.ndof_u, B),
                    jnp.float32)
    pw, meta = lane_contact.make_pair_wrenches(struct, interpret=True)
    es0 = lanes.build_env_step(struct, FS, refresh=0, bwd_mode="stale")
    esf = lanes.build_env_step(struct, FS, refresh=0, bwd_mode="stale",
                               fused_pw=(pw, meta))
    s0 = es0(model, st0, u)
    sf = esf(model, st0, u)
    scale = float(jnp.max(jnp.abs(s0.q)))
    assert float(jnp.max(jnp.abs(sf.q - s0.q))) < 1e-4 * scale

    def mkloss(es):
        def loss(uu):
            s = es(model, st0, uu)
            return jnp.sum(s.q ** 2) + 1e-2 * jnp.sum(s.qdot ** 2)
        return loss

    g0 = jax.grad(mkloss(es0))(u)
    gf = jax.grad(mkloss(esf))(u)
    cos = float(jnp.sum(g0 * gf)
                / (jnp.linalg.norm(g0) * jnp.linalg.norm(gf) + 1e-30))
    assert cos > 0.9999, cos
