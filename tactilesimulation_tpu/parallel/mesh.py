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

import inspect
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
                           axis: str = "batch", num_replicated: int = 2):
    """jit ``update_fn(*replicated_args, *per_episode_args)`` with the first
    ``num_replicated`` arguments (params, opt_state, ...) replicated and the
    rest (keys / controls / any leading-episode-axis pytree) sharded over the
    mesh batch axis. Gradient reduction across chips rides ICI via XLA's
    inserted all-reduce."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    try:
        nargs = len(inspect.signature(update_fn).parameters)
    except (TypeError, ValueError):
        nargs = num_replicated + 1
    in_shardings = tuple(rep if i < num_replicated else shard
                         for i in range(nargs))
    return jax.jit(update_fn, in_shardings=in_shardings, out_shardings=None)
