"""Device-mesh utilities: the TPU-native replacement for the reference's
SubprocVecEnv process pool (SURVEY.md §2.5).

Parallelism model: physics scenes are tiny (ndof <= 12) — the scalable axes
are (a) the rollout/episode batch (data parallel over chips, gradient psum
over ICI) and (b) for the dense 40k-marker benchmark sensor, the marker axis.
``episode_sharded_update`` builds a jitted update whose per-episode inputs are
sharded over the mesh batch axis while parameters stay replicated; XLA inserts
the gradient all-reduce.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "batch"):
    """Place a pytree with leading per-episode axis onto the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def episode_sharded_update(mesh: Mesh, update_fn: Callable,
                           axis: str = "batch"):
    """jit ``update_fn(params, opt_state, keys, ...)`` with ``keys`` (and any
    further per-episode args) sharded over the mesh; params/opt_state
    replicated. Gradient reduction across chips rides ICI via XLA's psum."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def spec(i):
        return shard if i >= 2 else rep

    return jax.jit(update_fn,
                   in_shardings=(rep, rep, shard),
                   out_shardings=None)
