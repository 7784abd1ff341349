"""Rotation / rigid-transform utilities (pure jnp, dtype-polymorphic).

These are the building blocks for the reduced-coordinate kinematics in
``kinematics.py``. Conventions:

- quaternions are wxyz (matching the redmax XML schema, e.g.
  reference ``envs/assets/pusher/pusher.xml:17`` ``quat="1 0 0 0"``),
- rotation matrices are world-from-local (R @ x_local = x_world),
- rotation vectors (exponential coordinates) follow the free3d-exp joint
  parameterization (reference C2, SURVEY.md §2.3).

Everything is shape-polymorphic over leading batch dims and safe under
jit/vmap/grad (no data-dependent branching; the small-angle limits of
``rotvec_to_quat`` etc. use series expansions selected by ``jnp.where`` with
both branches finite).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a, b):
    """Hamilton product of wxyz quaternions (broadcasting)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotvec_to_quat(r):
    """Exponential map so(3) -> unit quaternion; series near 0 for stable AD."""
    angle_sq = jnp.sum(r * r, axis=-1, keepdims=True)
    angle = jnp.sqrt(angle_sq + _EPS)
    half = 0.5 * angle
    small = angle_sq < 1e-8
    # sin(a/2)/a and cos(a/2); Taylor for tiny angles keeps gradients exact.
    k_small = 0.5 - angle_sq / 48.0
    k = jnp.where(small, k_small, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * r], axis=-1)


def quat_to_rotvec(q):
    """Log map, inverse of rotvec_to_quat (principal branch)."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # w >= 0 branch
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    s = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(s, w)
    small = s < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), angle / jnp.maximum(s, _EPS))
    return scale * v


def euler_xyz_to_quat(e):
    """Intrinsic XYZ euler angles -> quaternion (free3d-euler joints)."""
    half = 0.5 * e
    cx, cy, cz = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sx, sy, sz = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    return jnp.stack(
        [
            cx * cy * cz - sx * sy * sz,
            sx * cy * cz + cx * sy * sz,
            cx * sy * cz - sx * cy * sz,
            cx * cy * sz + sx * sy * cz,
        ],
        axis=-1,
    )


def axis_angle_quat(axis, angle):
    """Unit axis (static) + angle (traced) -> quaternion."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def vee(m):
    """Inverse hat: skew matrix -> vector."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def hat(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def transform_compose(p_a, q_a, p_b, q_b):
    """Compose rigid transforms: (p, q)_a ∘ (p, q)_b."""
    return p_a + quat_rotate(q_a, p_b), quat_mul(q_a, q_b)


def transform_apply(p, q, x):
    return p + quat_rotate(q, x)


def rotvec_mul(r_a, r_b):
    """Compose two rotation vectors (reference utils/torch_utils.py:18-37)."""
    return quat_to_rotvec(quat_mul(rotvec_to_quat(r_a), rotvec_to_quat(r_b)))
