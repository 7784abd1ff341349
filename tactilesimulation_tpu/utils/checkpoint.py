"""Checkpoint / resume.

The reference checkpoints only [policy, obs_rms] via torch.save and loses
optimizer state + epoch counters on restart (SURVEY.md §5.4). Here a
checkpoint is the full training state pytree (params, optimizer state, step
counter, normalizer stats), saved with orbax when available and a
numpy-pickle fallback otherwise. Restoring resumes training exactly.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def save_state(path: str, state: Any):
    """state: arbitrary pytree (params/opt_state/epoch/rms/...)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.abspath(path), _to_host(state), force=True)
    except Exception:
        with open(path + ".pkl", "wb") as fp:
            pickle.dump(_to_host(state), fp)


def restore_state(path: str, target: Optional[Any] = None):
    try:
        import orbax.checkpoint as ocp
        ckpt = ocp.PyTreeCheckpointer()
        if os.path.isdir(path):
            return ckpt.restore(os.path.abspath(path), item=target)
    except Exception:
        pass
    with open(path if path.endswith(".pkl") else path + ".pkl", "rb") as fp:
        state = pickle.load(fp)
    if target is not None:
        # re-leaf onto the target treedef (restores jnp arrays)
        import jax.numpy as jnp
        state = jax.tree.map(lambda t, s: jnp.asarray(s), target, state)
    return state
