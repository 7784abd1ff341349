"""Worker for tests/test_distributed.py: one process of a 2-process CPU
cluster. Usage: python _dist_worker.py <coordinator> <nprocs> <proc_id> <out>.

Each process owns 2 virtual CPU devices -> 4-device global mesh. Runs one
episode-sharded gradient step (replicated params, sharded batch) and writes
the gradient + the single-process reference gradient; the test asserts both
processes produced the reference values (i.e. the DCN all-reduce worked).
"""

import os
import sys

# force exactly 2 local devices, replacing any inherited device-count flag
# (pytest's conftest exports an 8-device XLA_FLAGS)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=2"])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tactilesimulation_tpu.parallel import distributed  # noqa: E402


def main():
    coordinator, nprocs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    assert distributed.initialize(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs

    mesh = distributed.global_mesh()
    assert mesh.devices.size == 2 * nprocs

    def loss(w, xs):
        return jnp.mean(jnp.sum(jnp.tanh(xs @ w) ** 2, axis=-1))

    w = jnp.ones((4, 4)) * 0.3
    xs_global = np.arange(16 * 4, dtype=np.float32).reshape(16, 4) / 64.0
    local = distributed.host_local_size(16, mesh)
    xs_local = xs_global[pid * local:(pid + 1) * local]

    xs = distributed.global_batch_array(mesh, xs_local)
    w_rep = distributed.replicated(mesh, w)

    from jax.sharding import NamedSharding, PartitionSpec as P
    step = jax.jit(jax.grad(loss),
                   in_shardings=(NamedSharding(mesh, P()),
                                 NamedSharding(mesh, P("batch"))))
    g = step(w_rep, xs)
    # fully-replicated output: every process can read it whole
    g_local = np.asarray(jax.device_get(g))
    g_ref = np.asarray(jax.grad(loss)(w, jnp.asarray(xs_global)))
    np.savez(out_path, g=g_local, g_ref=g_ref)
    print(f"proc {pid}: ok")


if __name__ == "__main__":
    main()
