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

    # ---- batched (lane-major-capable) rollout path -------------------------
    def lane_env(self) -> Optional["FunctionalEnv"]:
        """Return a lane-major (batch-last) twin of this env, or None.

        Envs with a `sim.lanes`-backed implementation override this; trainers
        call it to route batched BPTT rollouts through the layout that keeps
        the TPU VPU lanes full (see sim/lanes.py for the why)."""
        return None

    def batched_rollout_fn(self, policy_apply: Callable, horizon: int,
                           remat: bool = False, with_obs: bool = False):
        """Build run(params, keys (E, ...)) -> (rewards (E, H), dones, infos
        [, obs (E, H, obs_dim)]) — a whole epoch of episodes as one program.

        Default: vmap of the per-episode rollout. Lane-major envs override
        with a batch-in-the-last-axis core (same contract, batch-first at
        this boundary). ``with_obs`` additionally stacks the per-step
        observations (the GD trainer's obs_rms update needs them,
        reference algorithms/gd.py:226-246)."""

        def body(carry, _):
            state, obs, params = carry
            action = policy_apply(params, obs)
            state, obs2, reward, done, info = self.step(state, action)
            out = (reward, done, info) + ((obs,) if with_obs else ())
            return (state, obs2, params), out

        fbody = jax.checkpoint(body) if remat else body

        def run_one(params, key):
            state, obs = self.reset(key)
            _, outs = jax.lax.scan(fbody, (state, obs, params), None,
                                   length=horizon)
            return outs

        def run(params, keys):
            return jax.vmap(run_one, in_axes=(None, 0))(params, keys)

        return run
