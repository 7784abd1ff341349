"""Multi-chip sharding validation on the 8-device virtual CPU mesh:
the driver's dryrun contract plus mesh utility checks."""

import sys

import pytest

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    q, reward = out
    assert np.all(np.isfinite(np.asarray(q)))


def test_episode_sharded_gradients_match_single_device():
    """psum'd sharded gradients == unsharded gradients."""
    from tactilesimulation_tpu.parallel import mesh as pmesh

    def loss(w, xs):
        return jnp.mean(jnp.sum((xs @ w) ** 2, axis=-1))

    w = jnp.ones((4, 4))
    xs = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    g_ref = jax.grad(loss)(w, xs)

    mesh = pmesh.make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs_sharded = jax.device_put(xs, NamedSharding(mesh, P("batch")))
    w_rep = jax.device_put(w, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(w_rep, xs_sharded)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_sharded),
                               rtol=1e-6)
