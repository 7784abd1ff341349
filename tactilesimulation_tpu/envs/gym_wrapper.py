"""Host-side stateful wrapper exposing the reference gym API.

Gives a FunctionalEnv the reference's interface (envs/redmax_torch_env.py):
``reset() -> obs``, ``step(u) -> (obs, reward, done, info)``, ``seed()``,
``action_space``/``observation_space``-style shape attributes — so reference
driver scripts port over with minimal changes. Numpy in/out; the functional
env runs jitted underneath.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import FunctionalEnv


class GymEnv:
    def __init__(self, env: FunctionalEnv, seed: int = 0):
        self.env = env
        self._reset = jax.jit(env.reset)
        self._step = jax.jit(env.step)
        self._state = None
        self.seed(seed)
        self.ndof_u = env.ndof_u
        self.action_shape = (env.ndof_u,)
        self.observation_shape = env.obs_size()
        self.max_episode_steps = env.max_episode_steps

    def seed(self, seed=0):
        self._key = jax.random.PRNGKey(seed)
        return [seed]

    def reset(self):
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset(k)
        self._t = 0
        self._traj = [np.asarray(self._state.sim.q)]
        return jax.tree.map(np.asarray, obs)

    def step(self, u):
        self._state, obs, reward, done, info = self._step(
            self._state, jnp.asarray(u))
        self._t += 1
        self._traj.append(np.asarray(self._state.sim.q))
        done = bool(done) or self._t >= self.max_episode_steps
        info = {k: np.asarray(v) for k, v in info.items()}
        if self._t >= self.max_episode_steps:
            info["TimeLimit.truncated"] = True
        return jax.tree.map(np.asarray, obs), float(reward), done, info

    def render(self, mode="once", record_path="render.gif"):
        """Headless replay of the episode so far (reference
        redmax_torch_env.py:52-70 render modes once/loop/record).

        ``once``/``loop`` return the current frame as an RGB array;
        ``record`` writes the episode trajectory to ``record_path`` (GIF, or
        numbered PNGs when the path is a folder) and returns the frame count.
        """
        from ..utils import renderer
        env = self.env
        # render with the effective per-episode model: envs with domain
        # randomization rebuild it from the episode extras (_model_for);
        # others draw the nominal model
        if hasattr(env, "_model_for") and self._state is not None:
            model = env._model_for(self._state.extras)
        else:
            model = env.model
        if mode == "record" and len(getattr(self, "_traj", [])) > 1:
            return renderer.render_trajectory(
                env.struct, model, np.stack(self._traj), record_path)
        import matplotlib.pyplot as plt
        fig = renderer.render_frame(env.struct, model,
                                    np.asarray(self._state.sim.q))
        fig.canvas.draw()
        frame = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return frame
