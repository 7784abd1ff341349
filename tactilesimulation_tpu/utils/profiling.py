"""Tracing / profiling subsystem.

The reference has wall-clock FPS prints only (SURVEY.md §5.1 — "JAX profiler +
per-kernel timing is a first-class need" for the TPU build). This module
provides:

- ``trace(logdir)``: context manager around ``jax.profiler.trace`` — captures
  a device trace (XLA ops, Pallas kernels, host callbacks) viewable in
  TensorBoard's profile plugin or Perfetto.
- ``annotate(name)``: named region that shows up inside device traces
  (``jax.profiler.TraceAnnotation``).
- ``PhaseTimer``: accumulating named wall-clock phases with proper
  ``block_until_ready`` synchronization — cheap always-on timing for trainer
  phase breakdowns (rollout / grad / update / eval), logged to TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_trace: bool = False):
    """Capture a JAX device+host profile into ``logdir``.

    View with: ``tensorboard --logdir <logdir>`` (PROFILE tab), or pass
    ``create_perfetto_trace=True`` for a perfetto .json.gz link.
    """
    with jax.profiler.trace(logdir,
                            create_perfetto_trace=create_perfetto_trace):
        yield


def annotate(name: str):
    """Named trace region: ``with annotate("rollout"): ...``."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    >>> pt = PhaseTimer()
    >>> with pt.phase("rollout", sync=out):
    ...     out = rollout_fn(...)
    >>> pt.report()   # {'rollout': {'total_s': ..., 'calls': ...}}

    ``sync`` (a pytree) is blocked on at phase exit so device work is
    attributed to the phase that launched it (async dispatch otherwise
    attributes it to whoever blocks first).
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            tree = box.get("sync", sync)
            if tree is not None:
                jax.block_until_ready(tree)
            self.totals[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "calls": self.calls[k],
                    "mean_s": self.totals[k] / max(self.calls[k], 1)}
                for k in self.totals}

    def log_to(self, writer, step: int, prefix: str = "profile/"):
        """Write mean phase times to a SummaryWriter-like object."""
        for name, total in self.totals.items():
            writer.add_scalar(f"{prefix}{name}_mean_s",
                              total / max(self.calls[name], 1), step)

    def reset(self):
        self.totals.clear()
        self.calls.clear()


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict:
    """Live HBM stats of a device (bytes_in_use / peak / limit) where the
    backend exposes them; {} otherwise."""
    dev = device or jax.devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:
        return {}
