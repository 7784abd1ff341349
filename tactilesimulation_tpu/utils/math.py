"""Math utilities — parity with the reference utils/torch_utils.py (P14) and
utils/math.py surface, on jnp. Quaternion/rotation algebra lives in
sim/spatial.py; re-exported here for the reference-like import path."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.spatial import (  # noqa: F401  (re-exports)
    euler_xyz_to_quat,
    quat_conj,
    quat_mul,
    quat_rotate,
    quat_to_mat,
    quat_to_rotvec,
    rotvec_mul,
    rotvec_to_quat,
)


def scale(x, lower, upper):
    """[-1, 1] -> [lower, upper] (reference torch_utils.py:236-239)."""
    return 0.5 * (x + 1.0) * (upper - lower) + lower


def unscale(x, lower, upper):
    return (2.0 * x - upper - lower) / (upper - lower)


def remap(x, old_lower, old_upper, new_lower, new_upper):
    return scale(unscale(x, old_lower, old_upper), new_lower, new_upper)


def random_quaternions(key, n, dtype=jnp.float32):
    """Uniform random unit quaternions (reference torch_utils.py:253-275)."""
    u = jax.random.uniform(key, (n, 3), dtype=dtype)
    a, b, c = u[:, 0], u[:, 1], u[:, 2]
    return jnp.stack([
        jnp.sqrt(1 - a) * jnp.sin(2 * jnp.pi * b),
        jnp.sqrt(1 - a) * jnp.cos(2 * jnp.pi * b),
        jnp.sqrt(a) * jnp.sin(2 * jnp.pi * c),
        jnp.sqrt(a) * jnp.cos(2 * jnp.pi * c),
    ], axis=-1)


def grad_norm(grads):
    """Global L2 norm of a gradient pytree (reference torch_utils.py:277-284)."""
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(g**2) for g in leaves))


def flatten_params(tree):
    flat, _ = jax.flatten_util.ravel_pytree(tree)
    return flat


def fill_params(tree, flat):
    _, unravel = jax.flatten_util.ravel_pytree(tree)
    return unravel(flat)
