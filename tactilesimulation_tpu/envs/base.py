"""Functional env API.

The reference wraps each task in a stateful ``gym.Env`` owning a mutable C++
simulation (SURVEY.md P4-P9). Here an env is a pair of pure functions over
pytrees:

    env.reset(key)                -> (EnvState, obs)
    env.step(state, action)       -> (EnvState, obs, reward, done, info)

Everything composes with jit/vmap/grad/scan: batched rollouts are
``vmap(env.step)``, BPTT is ``jax.grad`` through a scan of steps, and
per-episode domain randomization lives inside ``EnvState.model_var`` (Model
leaf overrides sampled at reset — batched heterogeneous physics for free).

``envs/gym_wrapper.py`` provides the host-side stateful wrapper with the
reference's gym API for parity tests and interactive use.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..sim.types import Model, SimState


@struct.dataclass
class EnvState:
    sim: SimState
    key: jax.Array                 # PRNG key
    t: jax.Array                   # () int32 env-step counter
    extras: Any                    # env-specific pytree (goal, randomization, ...)


class FunctionalEnv:
    """Base: subclasses bind (struct, model) and implement reset/step."""

    #: gym-style metadata
    max_episode_steps: int = 1000

    def __init__(self, struct_, model: Model):
        self.struct = struct_
        self.model = model

    # subclasses implement:
    def reset(self, key) -> Tuple[EnvState, Any]:
        raise NotImplementedError

    def step(self, state: EnvState, action) -> Tuple[
            EnvState, Any, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        raise NotImplementedError

    # ---- conveniences ----------------------------------------------------
    @property
    def ndof_u(self) -> int:
        """Policy action dimension (may differ from the scene's motor count,
        e.g. TactilePush exposes 3 of 6 motor dofs; the rest carry the
        scripted disturbance force, reference tactile_push_env.py:69)."""
        return getattr(self, "action_dim", self.struct.ndof_u)

    def rollout_fn(self, policy_apply: Callable, horizon: int,
                   remat: bool = True):
        """Build (params, key) -> (total_reward, info) running a full episode
        with ``action = policy_apply(params, obs)``. Differentiable w.r.t.
        params (the reference GD path, algorithms/gd.py:220-264)."""

        def body(carry, _):
            state, obs, params = carry
            action = policy_apply(params, obs)
            state, obs, reward, done, info = self.step(state, action)
            return (state, obs, params), (reward, done, info)

        fbody = jax.checkpoint(body) if remat else body

        def run(params, key):
            state, obs = self.reset(key)
            (_, _, _), (rewards, dones, infos) = jax.lax.scan(
                fbody, (state, obs, params), None, length=horizon)
            return rewards, dones, infos

        return run
