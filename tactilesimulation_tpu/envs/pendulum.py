"""Pendulum swing-up: a minimal first-party functional env.

Not part of the reference task suite — exists as (a) the cheap-to-compile
fixture the algorithm tests train on end-to-end, and (b) the smallest
end-to-end example of authoring an env on the differentiable core.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct as fstruct

from ..model import scenes
from ..sim import integrators
from .base import EnvState, FunctionalEnv


@fstruct.dataclass
class PendulumExtras:
    pass


class PendulumEnv(FunctionalEnv):
    max_episode_steps = 100
    action_dim = 1

    def __init__(self, struct_, model, torque_limit=4.0):
        super().__init__(struct_, model)
        self.torque_limit = torque_limit
        self._step_sim = integrators.build_step(struct_)

    def obs_size(self):
        return (3,)

    def _obs(self, sim):
        th, w = sim.q[0], sim.qdot[0]
        return jnp.stack([jnp.cos(th), jnp.sin(th), w])

    def reset(self, key):
        kq, kw, knext = jax.random.split(key, 3)
        dtype = self.model.q_init.dtype
        q = jax.random.uniform(kq, (1,), minval=-jnp.pi, maxval=jnp.pi,
                               dtype=dtype)
        w = jax.random.uniform(kw, (1,), minval=-1.0, maxval=1.0, dtype=dtype)
        sim = integrators.initial_state(self.struct, self.model).replace(
            q=q, q_prev=q, qdot=w, qdot_prev=w)
        state = EnvState(sim=sim, key=knext, t=jnp.zeros((), jnp.int32),
                         extras=PendulumExtras())
        return state, self._obs(sim)

    def step(self, state, u):
        tau = self.torque_limit * jnp.tanh(u)
        sim = self._step_sim(self.model, state.sim, tau)
        # upright = angle pi; standard swing-up cost as reward
        angle_err = jnp.mod(sim.q[0] - jnp.pi + jnp.pi, 2 * jnp.pi) - jnp.pi
        reward = -(angle_err**2 + 0.1 * sim.qdot[0] ** 2
                   + 0.001 * jnp.sum(u**2))
        new_state = state.replace(sim=sim, t=state.t + 1)
        return (new_state, self._obs(sim), reward, jnp.zeros((), bool),
                {"angle_err": jnp.abs(angle_err)})


def make(timestep=1e-2, damping=0.05, torque_limit=4.0, **_):
    struct_, model = scenes.pendulum(timestep=timestep, damping=damping)
    return PendulumEnv(struct_, model, torque_limit)
