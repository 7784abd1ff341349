"""Articulated dynamics in momentum form, derived from FK via autodiff.

The reference's C++ core hand-derives RedMax reduced-coordinate dynamics with
explicit mass matrices and adjoint recursions (SURVEY.md C2/C3/C7). The
TPU-native formulation here works directly with the discrete Euler-Lagrange
equations in *momentum form*, which keeps the autodiff graphs shallow (the
original mass-matrix + Coriolis formulation needed third-order nested AD in
the Newton Jacobian and blew up XLA compile times):

    T(q, v)   kinetic energy from body velocities (one jvp over FK)
    p(q, v) = dT/dv                     generalized momentum (one grad)
    dynamics: d/dt p = dT/dq - dV/dq + Q(q, v, u)   (Euler-Lagrange)

The integrator residual (integrators.py) discretizes the momentum balance, so
no mass matrix, no Mdot v, no Christoffel terms ever appear in the hot path.
``mass_matrix`` is still provided (via jacfwd of the momentum) for tests and
analysis.

Generalized contact forces use the VJP trick: Q = (dX/dq)^T f for application
points X(q) — one reverse pass instead of ndof forward columns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import contact, kinematics, spatial
from .types import Model, Structure


def body_velocities(struct: Structure, model: Model, q, v):
    """Linear + angular world velocities of every body via one jvp over FK."""
    fk = lambda qq: kinematics.fk_bodies(struct, model, qq)
    (p, quat), (pd, quatd) = jax.jvp(fk, (q,), (v,))
    w = 2.0 * spatial.quat_mul(quatd, spatial.quat_conj(quat))[..., 1:]
    return p, quat, pd, w


def kinetic_energy(struct: Structure, model: Model, q, v):
    p, quat, pd, w = body_velocities(struct, model, q, v)
    del p
    R = spatial.quat_to_mat(quat)
    w_local = jnp.einsum("bji,bj->bi", R, w, precision=jax.lax.Precision.HIGHEST)
    return (0.5 * jnp.sum(model.body_mass * jnp.sum(pd * pd, axis=-1))
            + 0.5 * jnp.sum(model.body_inertia * w_local * w_local))


def momentum(struct: Structure, model: Model, q, v):
    """Generalized momentum p = dT/dv (equals M(q) v)."""
    return jax.grad(lambda vv: kinetic_energy(struct, model, q, vv))(v)


def dT_dq(struct: Structure, model: Model, q, v):
    return jax.grad(lambda qq: kinetic_energy(struct, model, qq, v))(q)


def potential_energy(struct: Structure, model: Model, q):
    p, _ = kinematics.fk_bodies(struct, model, q)
    return -jnp.sum(model.body_mass * (p @ model.gravity))


def gravity_force(struct: Structure, model: Model, q):
    return -jax.grad(lambda qq: potential_energy(struct, model, qq))(q)


def lagrangian(struct: Structure, model: Model, q, v):
    """L = T - V. Body positions are shared between T's FK and V, so one AD
    pass over L yields momentum AND all conservative generalized forces."""
    p, quat, pd, w = body_velocities(struct, model, q, v)
    R = spatial.quat_to_mat(quat)
    w_local = jnp.einsum("bji,bj->bi", R, w, precision=jax.lax.Precision.HIGHEST)
    T = (0.5 * jnp.sum(model.body_mass * jnp.sum(pd * pd, axis=-1))
         + 0.5 * jnp.sum(model.body_inertia * w_local * w_local))
    V = -jnp.sum(model.body_mass * (p @ model.gravity))
    return T - V


def el_terms(struct: Structure, model: Model, q, v):
    """(dL/dq, p = dL/dv) in ONE reverse pass — the Euler-Lagrange pieces the
    integrator residual needs (dT/dq - dV/dq and the momentum)."""
    return jax.grad(lambda qq, vv: lagrangian(struct, model, qq, vv),
                    argnums=(0, 1))(q, v)


def mass_matrix(struct: Structure, model: Model, q):
    """M(q) = d p / d v (for tests/analysis; not used in the step hot path)."""
    return jax.jacfwd(lambda vv: momentum(struct, model, q, vv))(
        jnp.zeros(struct.ndof_q, q.dtype))


def joint_spring_forces(model: Model, q, v):
    """Viscous joint damping + joint-limit penalty (XML damping / lim /
    lim_stiffness, reference pusher.xml:9,17)."""
    f = -model.dof_damping * v
    below = jnp.maximum(model.dof_lim_lower - q, 0.0)
    above = jnp.maximum(q - model.dof_lim_upper, 0.0)
    return f + model.dof_lim_stiffness * (below - above)


def motor_forces(struct: Structure, model: Model, q, v, u):
    """Actuation (C4): u clipped to ctrl_range, applied raw as force or as a
    PD position target (the stable_grasp grasp script passes raw joint
    position targets, so no [-1,1] rescaling happens — matching that call
    site, stable_grasp_env.py:197-233)."""
    if struct.ndof_u == 0:
        return jnp.zeros_like(q)
    dof = jnp.asarray(struct.motor_dof)
    uc = jnp.clip(u, model.motor_ctrl_lo, model.motor_ctrl_hi)
    qm = jnp.take(q, dof)
    vm = jnp.take(v, dof)
    pd = model.motor_kp * (uc - qm) - model.motor_kd * vm
    tau = model.motor_pos_mask * pd + (1.0 - model.motor_pos_mask) * uc
    return jnp.zeros_like(q).at[dof].add(tau)


def _rotate_vjp(quat, xi, cot):
    """Cotangent on quat of quat_rotate(quat, xi) . cot (vectorized rows)."""
    _, pullback = jax.vjp(spatial.quat_rotate, quat, xi)
    return pullback(cot)[0]


def contact_terms(struct: Structure, model: Model, q, v):
    """All contact/tactile instance forces.

    Returns (Q (ndof,) generalized contact force, tac_force (Mtot,3) world
    marker forces).

    One ``jax.linearize`` of the combined FK provides point/body velocities
    (forward application) AND, transposed, the generalized-force projection
    Q = J^T f — no second FK or separate vjp graph. Forces act at material
    points: on the general side at the contact points themselves (for
    analytic sphere contacts, at the body-frame surface point — this is what
    makes a ball ROLL under friction), and on the primitive side at the
    body-frame coincident point; both enter as cotangents on (body_pos,
    body_quat, points)."""
    groups = struct.contact_groups
    ntac = len(struct.tac_joint)
    dtype = q.dtype
    if not groups:
        return jnp.zeros_like(q), jnp.zeros((ntac, 3), dtype)

    fk = lambda qq: kinematics.fk_all(struct, model, qq)
    (bp, bquat, pts), fk_lin = jax.linearize(fk, q)
    bv, bquatd, pts_dot = fk_lin(v)
    bw = 2.0 * spatial.quat_mul(bquatd, spatial.quat_conj(bquat))[..., 1:]
    bR = spatial.quat_to_mat(bquat)
    params = contact.combined_params(model).astype(dtype)

    per_group = []
    for g in groups:
        f, x_eff, xi_p = contact.group_forces(
            g, model, pts, pts_dot, bp, bR, bv, bw, params)
        per_group.append((g, f, x_eff, xi_p))

    # tactile field: scatter instance forces onto marker rows
    tac_force = jnp.zeros((ntac + 1, 3), dtype)
    for g, f, _, _ in per_group:
        rows = jnp.asarray(g.tac_row) + 1
        tac_force = tac_force.at[rows].add(
            jnp.where((jnp.asarray(g.tac_row) >= 0)[:, None], f, 0.0))
    tac_force = tac_force[1:]

    # cotangent assembly: forces at material points -> (bp, bquat, pts) bars
    B = struct.nbodies
    bp_bar = jnp.zeros((B, 3), dtype)
    bquat_bar = jnp.zeros((B, 4), dtype)
    pts_bar = jnp.zeros_like(pts)
    for g, f, x_eff, xi_p in per_group:
        if g.sphere_general:
            gi = jnp.asarray(g.point_idx)
            qg = jnp.take(bquat, gi, axis=0)
            xi_g = jax.lax.stop_gradient(
                spatial.quat_rotate(spatial.quat_conj(qg),
                                    x_eff - jnp.take(bp, gi, axis=0)))
            bp_bar = bp_bar.at[gi].add(f)
            bquat_bar = bquat_bar.at[gi].add(_rotate_vjp(qg, xi_g, f))
        else:
            pts_bar = pts_bar.at[jnp.asarray(g.point_idx)].add(f)
        if g.gtype != contact.GROUND:
            pi = jnp.asarray(g.prim_body)
            qp = jnp.take(bquat, pi, axis=0)
            bp_bar = bp_bar.at[pi].add(-f)
            bquat_bar = bquat_bar.at[pi].add(
                _rotate_vjp(qp, jax.lax.stop_gradient(xi_p), -f))

    transpose = jax.linear_transpose(fk_lin, q)
    (Q,) = transpose((bp_bar, bquat_bar, pts_bar))
    return Q, tac_force


def applied_forces(struct: Structure, model: Model, q, v, u):
    """Non-conservative generalized forces: damping + limits + motors +
    contact (gravity lives in the Lagrangian — see el_terms)."""
    Q_contact, tac_force = contact_terms(struct, model, q, v)
    Q = (joint_spring_forces(model, q, v)
         + motor_forces(struct, model, q, v, u)
         + Q_contact)
    return Q, tac_force


def generalized_forces(struct: Structure, model: Model, q, v, u):
    """Total non-inertial generalized force Q(q, v, u) + tactile world forces
    (gravity included — for tests/analysis)."""
    Q, tac_force = applied_forces(struct, model, q, v, u)
    return Q + gravity_force(struct, model, q), tac_force


def tactile_field(struct: Structure, model: Model, q, v):
    """Dense tactile output in sensor frame: (Mtot, 3) rows of
    [shear_axis0, shear_axis1, normal] — the reference
    ``get_tactile_force_vector()`` reshaped (C6)."""
    _, tac_force = contact_terms(struct, model, q, v)
    return tactile_field_from_forces(struct, model, q, tac_force)


def tactile_field_from_forces(struct: Structure, model: Model, q, tac_force):
    n_w, a0_w, a1_w = kinematics.tactile_frames_world(struct, model, q)
    return jnp.stack(
        [jnp.sum(tac_force * a0_w, axis=-1),
         jnp.sum(tac_force * a1_w, axis=-1),
         jnp.sum(tac_force * n_w, axis=-1)], axis=-1)
