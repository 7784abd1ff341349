"""Multi-host runtime: ``jax.distributed`` wiring + host-spanning meshes.

TPU-native replacement for the reference's SubprocVecEnv process pool
(reference externals/pytorch-a2c-ppo-acktr-gail/a2c_ppo_acktr/envs.py:105-108,
SURVEY.md §2.5/§5.8): instead of 8 OS processes each owning a private C++ sim
and a pipe back to a single-process learner, every host runs the SAME
single-controller JAX program; ``initialize()`` forms the cluster over DCN,
``global_mesh()`` spans every chip of every host, and the one jitted train
step shards the episode axis across the whole mesh — XLA inserts the gradient
all-reduce, which rides ICI within a host and DCN across hosts.

Launch pattern (one command per host; also what tests/test_distributed.py
spawns locally with CPU devices):

    TSIM_COORDINATOR=host0:12345 TSIM_NUM_PROCS=2 TSIM_PROC_ID=<i> \
        python examples/TactilePushExp/train_tactile_push_gd.py ...

with ``distributed.initialize()`` called before first jax use.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join (or skip) the multi-host cluster.

    Arguments default to the ``TSIM_COORDINATOR`` / ``TSIM_NUM_PROCS`` /
    ``TSIM_PROC_ID`` environment variables; on TPU pods with a supported
    launcher they may all be None (jax auto-detects). Returns True iff a
    multi-process runtime was initialized; single-process runs are a no-op
    so every entry point can call this unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "TSIM_COORDINATOR")
    if num_processes is None and "TSIM_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["TSIM_NUM_PROCS"])
    if process_id is None and "TSIM_PROC_ID" in os.environ:
        process_id = int(os.environ["TSIM_PROC_ID"])
    if not coordinator_address and not num_processes:
        return False
    if num_processes == 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis: str = "batch") -> Mesh:
    """1-D mesh over every device of every process (ICI + DCN)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_size(global_batch: int, mesh: Mesh) -> int:
    """Per-process share of a global episode batch (batch must divide)."""
    n = mesh.devices.size
    assert global_batch % n == 0, (
        f"global batch {global_batch} must divide the {n}-device mesh")
    return global_batch // jax.process_count()


def global_batch_array(mesh: Mesh, local_batch, axis: str = "batch"):
    """Assemble a mesh-global array from each process's local shard.

    ``local_batch``: pytree of host-local numpy/jnp arrays with the leading
    per-episode axis. On a single process this is just a device_put with the
    batch sharding; with multiple processes it builds the global view via
    ``jax.make_array_from_process_local_data`` (the DCN-aware constructor).
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local_batch)


def replicated(mesh: Mesh, tree):
    """Replicate a pytree (params/opt_state) over the global mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def global_from_full(mesh: Mesh, full, axis: str = "batch"):
    """Shard a batch that every process holds identically (e.g. PRNG keys
    derived from a shared seed): each process contributes its own slice of
    the leading axis; the result is one mesh-global array."""
    if jax.process_count() == 1:
        return jax.device_put(full, NamedSharding(mesh, P(axis)))
    pc, pid = jax.process_count(), jax.process_index()

    def shard_one(x):
        assert x.shape[0] % pc == 0, (
            f"leading axis {x.shape[0]} must divide the {pc}-process "
            "cluster (episodes would be silently dropped otherwise)")
        loc = x.shape[0] // pc
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(axis)),
            np.asarray(x[pid * loc:(pid + 1) * loc]))

    return jax.tree.map(shard_one, full)
