"""Lane-major (batch-last) core vs vmap of the single-instance core.

The lane-major path must be bit-compatible physics: same momentum-form
residual, same chord solve, same IFT adjoint — only the data layout differs.
These tests pin FK, full implicit steps (both contact families: point-vs-
cuboid/ground on TactilePush, analytic-sphere + marker-vs-sphere on
RollingBall), and BPTT control gradients against the reference layout in
float64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.model import task_scenes
from tactilesimulation_tpu.sim import integrators, kinematics, lanes

pytestmark = pytest.mark.slow  # compile-bound: minutes on the CPU mesh

B = 3


def _batch_states(struct, model, rng, scale=0.02):
    n = struct.ndof_q
    q = model.q_init[None, :] + jnp.asarray(rng.normal(scale=scale,
                                                       size=(B, n)))
    qdot = jnp.asarray(rng.normal(scale=0.1, size=(B, n)))
    state = integrators.initial_state(struct, model)
    states = jax.vmap(lambda qq, vv: state.replace(q=qq, qdot=vv,
                                                   q_prev=qq, qdot_prev=vv))(
        q, qdot)
    return states, q, qdot


def test_fk_parity():
    struct, model = task_scenes.tactile_push()
    rng = np.random.default_rng(0)
    _, q, _ = _batch_states(struct, model, rng)
    jp_ref, jq_ref = jax.vmap(
        lambda qq: kinematics.fk_joints(struct, model, qq))(q)   # (B, J, ·)
    jp, jq = lanes.fk_joints(struct, model, q.T)                 # (·, J, B)
    np.testing.assert_allclose(np.asarray(jp).transpose(2, 1, 0),
                               np.asarray(jp_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jq).transpose(2, 1, 0),
                               np.asarray(jq_ref), atol=1e-12)
    var_ref = jax.vmap(
        lambda qq: kinematics.ee_positions(struct, model, qq))(q)
    var = lanes.ee_positions(struct, model, q.T)
    np.testing.assert_allclose(np.asarray(var).T, np.asarray(var_ref),
                               atol=1e-12)


@pytest.mark.parametrize("scene", ["push", "ball"])
def test_step_parity(scene):
    if scene == "push":
        struct, model = task_scenes.tactile_push()
        rng = np.random.default_rng(1)
    else:
        struct, model = task_scenes.rolling_ball(resolution=8)
        rng = np.random.default_rng(2)
    states, q, qdot = _batch_states(struct, model, rng,
                                    scale=0.001 if scene == "ball" else 0.02)
    nu = len(struct.motor_dof)
    u = jnp.asarray(np.random.default_rng(3).normal(scale=0.05, size=(B, nu)))

    step_ref = integrators.build_step(struct)
    out_ref = jax.jit(jax.vmap(lambda s, uu: step_ref(model, s, uu)))(
        states, u)

    step_l = lanes.build_step(struct)
    state_l = lanes.LaneSimState(q=q.T, qdot=qdot.T, q_prev=q.T,
                                 qdot_prev=qdot.T,
                                 t=jnp.zeros(B, jnp.int32))
    out_l = jax.jit(lambda s, uu: step_l(model, s, uu))(state_l, u.T)

    np.testing.assert_allclose(np.asarray(out_l.q).T, np.asarray(out_ref.q),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out_l.qdot).T,
                               np.asarray(out_ref.qdot),
                               rtol=1e-8, atol=1e-8)


def test_bptt_gradient_parity():
    """d(total final-q objective)/d(controls) through 3 implicit steps."""
    struct, model = task_scenes.tactile_push()
    rng = np.random.default_rng(4)
    states, q, qdot = _batch_states(struct, model, rng)
    nu = len(struct.motor_dof)
    T = 3
    us = jnp.asarray(rng.normal(scale=0.05, size=(B, T, nu)))

    step_ref = integrators.build_step(struct)

    def loss_ref(us_b):
        def one(state, us1):
            def body(s, uu):
                s2 = step_ref(model, s, uu)
                return s2, jnp.sum(s2.q ** 2)
            _, outs = jax.lax.scan(body, state, us1)
            return jnp.sum(outs)
        return jnp.sum(jax.vmap(one)(states, us_b))

    step_l = lanes.build_step(struct)
    state_l = lanes.LaneSimState(q=q.T, qdot=qdot.T, q_prev=q.T,
                                 qdot_prev=qdot.T,
                                 t=jnp.zeros(B, jnp.int32))

    def loss_l(us_b):
        def body(s, uu):
            s2 = step_l(model, s, uu)
            return s2, jnp.sum(s2.q ** 2)
        _, outs = jax.lax.scan(body, state_l,
                               jnp.moveaxis(us_b, 1, 0).transpose(0, 2, 1))
        return jnp.sum(outs)

    g_ref = jax.jit(jax.grad(loss_ref))(us)
    g_l = jax.jit(jax.grad(loss_l))(us)
    np.testing.assert_allclose(np.asarray(g_l), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-9)


def test_step_parity_batched_model():
    """Per-lane heterogeneous masses (StableGrasp-style density DR, C9):
    lane-major step with trailing-batch model leaves == vmap over models."""
    struct, model = task_scenes.tactile_push()
    rng = np.random.default_rng(7)
    states, q, qdot = _batch_states(struct, model, rng)
    nu = len(struct.motor_dof)
    u = jnp.asarray(rng.normal(scale=0.05, size=(B, nu)))
    scale = jnp.asarray(1.0 + 0.3 * rng.uniform(-1, 1, size=(B,)))
    bm = model.body_mass[None, :] * scale[:, None]              # (B, NB)
    bi = model.body_inertia[None] * scale[:, None, None]        # (B, NB, 3)

    step_ref = integrators.build_step(struct)
    model_axes = jax.tree.map(lambda _: None, model)
    model_axes = model_axes.replace(body_mass=0, body_inertia=0)
    models = model.replace(body_mass=bm, body_inertia=bi)
    out_ref = jax.jit(jax.vmap(step_ref, in_axes=(model_axes, 0, 0)))(
        models, states, u)

    step_l = lanes.build_step(struct)
    model_l = model.replace(body_mass=bm.T, body_inertia=bi.transpose(1, 2, 0))
    state_l = lanes.LaneSimState(q=q.T, qdot=qdot.T, q_prev=q.T,
                                 qdot_prev=qdot.T,
                                 t=jnp.zeros(B, jnp.int32))
    out_l = jax.jit(lambda m, s, uu: step_l(m, s, uu))(model_l, state_l, u.T)
    np.testing.assert_allclose(np.asarray(out_l.q).T, np.asarray(out_ref.q),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out_l.qdot).T,
                               np.asarray(out_ref.qdot), rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("scene", ["push", "ball", "grasp"])
def test_geometric_contact_matches_ad(scene):
    """The geometric-twist contact formulation (lanes.contact_terms) must
    equal the AD linearize/transpose oracle (lanes.contact_terms_ad) in value
    AND in (q, v) derivatives — covering revolute/planar/translational
    (push), free3d-exp + analytic sphere (ball), and free3d-euler +
    prismatic (grasp)."""
    if scene == "push":
        struct, model = task_scenes.tactile_push()
        dq = 0.02
    elif scene == "ball":
        struct, model = task_scenes.rolling_ball(resolution=8)
        dq = 0.0005
    else:
        struct, model = task_scenes.stable_grasp()
        dq = 0.005
    rng = np.random.default_rng(11)
    n = struct.ndof_q
    q = (model.q_init[:, None]
         + jnp.asarray(rng.normal(scale=dq, size=(n, B))))
    if scene == "ball":
        q = q.at[2].add(-0.0165)   # push the pad into the ball (see below)
    v = jnp.asarray(rng.normal(scale=0.1, size=(n, B)))

    Q_new, tac_new = lanes.contact_terms(struct, model, q, v)
    Q_ad, tac_ad = lanes.contact_terms_ad(struct, model, q, v)
    assert float(jnp.max(jnp.abs(Q_ad))) > 0, "no active contact in fixture"
    np.testing.assert_allclose(np.asarray(Q_new), np.asarray(Q_ad),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(tac_new), np.asarray(tac_ad),
                               rtol=1e-8, atol=1e-12)

    # derivative parity (what the chord matrix and IFT backward consume)
    def sum_new(qq, vv):
        return jnp.sum(lanes.contact_terms(struct, model, qq, vv)[0] ** 2)

    def sum_ad(qq, vv):
        return jnp.sum(lanes.contact_terms_ad(struct, model, qq, vv)[0] ** 2)

    gq_new, gv_new = jax.grad(sum_new, argnums=(0, 1))(q, v)
    gq_ad, gv_ad = jax.grad(sum_ad, argnums=(0, 1))(q, v)
    scale = float(jnp.max(jnp.abs(gq_ad))) + 1e-30
    np.testing.assert_allclose(np.asarray(gq_new) / scale,
                               np.asarray(gq_ad) / scale,
                               rtol=1e-7, atol=1e-9)
    scale = float(jnp.max(jnp.abs(gv_ad))) + 1e-30
    np.testing.assert_allclose(np.asarray(gv_new) / scale,
                               np.asarray(gv_ad) / scale,
                               rtol=1e-7, atol=1e-9)


def test_tactile_field_parity():
    from tactilesimulation_tpu.sim import dynamics
    struct, model = task_scenes.rolling_ball(resolution=8)
    rng = np.random.default_rng(5)
    n = struct.ndof_q
    q = model.q_init + jnp.asarray(rng.normal(scale=0.0005, size=n))
    # drive the pad down onto the ball: pad markers sit at z = 0.055 at rest
    # (pad joint z = 0.06, marker plane local z = -0.005) and the ball top is
    # at z = 0.04, so a -16.5 mm pad translation penetrates ~1.5 mm
    q = q.at[2].add(-0.0165)
    v = jnp.asarray(rng.normal(scale=0.05, size=n))
    ref = dynamics.tactile_field(struct, model, q, v)          # (M, 3)
    out = lanes.tactile_field(struct, model, q[:, None], v[:, None])
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(ref),
                               rtol=1e-8, atol=1e-12)
    assert float(jnp.sum(jnp.abs(ref))) > 0


def test_lane_env_parity_refresh1():
    """TactilePushLanes(solver_refresh=1, solver_bwd='exact') reproduces
    vmap(TactilePushEnv.step) to f32 round-off — the equivalence the module
    docstring documents (the DEFAULT amortized refresh=0 config trades this
    exact parity for speed; artifacts/SOLVER_ACCURACY_r04.jsonl)."""
    from tactilesimulation_tpu.envs import tactile_push, tactile_push_lanes
    env = tactile_push.make("no_tactile")
    lenv = tactile_push_lanes.TactilePushLanes(env, solver_refresh=1,
                                               solver_bwd="exact")
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states, obs_ref = jax.vmap(env.reset)(keys)
    lstate, obs = lenv.reset(keys)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(obs_ref),
                               rtol=1e-6, atol=1e-7)
    rng = np.random.default_rng(7)
    for _ in range(3):
        u = jnp.asarray(rng.normal(scale=0.3, size=(B, env.ndof_u)),
                        jnp.float32)
        states, obs_ref, r_ref, _, _ = jax.vmap(env.step)(states, u)
        lstate, obs, r, _, _ = lenv.step(lstate, u)
        np.testing.assert_allclose(np.asarray(lstate.sim.q.T),
                                   np.asarray(states.sim.q),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                                   rtol=1e-4, atol=1e-5)
