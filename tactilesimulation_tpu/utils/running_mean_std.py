"""Functional running mean/std (Welford parallel update) — jnp pytree version
of the reference utils/running_mean_std.py (P15), usable inside jit."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(shape, dtype=jnp.float32, epsilon=1e-4):
        return RunningMeanStd(mean=jnp.zeros(shape, dtype),
                              var=jnp.ones(shape, dtype),
                              count=jnp.asarray(epsilon, dtype))

    def update(self, batch) -> "RunningMeanStd":
        """batch: (N, *shape)."""
        bmean = jnp.mean(batch, axis=0)
        bvar = jnp.var(batch, axis=0)
        bcount = batch.shape[0]
        delta = bmean - self.mean
        tot = self.count + bcount
        new_mean = self.mean + delta * bcount / tot
        m_a = self.var * self.count
        m_b = bvar * bcount
        M2 = m_a + m_b + delta**2 * self.count * bcount / tot
        return RunningMeanStd(mean=new_mean, var=M2 / tot, count=tot)

    def normalize(self, x, un_norm=False):
        if un_norm:
            return x * jnp.sqrt(self.var + 1e-5) + self.mean
        return (x - self.mean) / jnp.sqrt(self.var + 1e-5)
