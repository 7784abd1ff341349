"""Random-policy smoke test for DClaw rotation (parity with the reference
examples/DClawExp/test_dclaw_env.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "../.."))

import numpy as np


def main():
    from tactilesimulation_tpu.envs import dclaw_rotate
    from tactilesimulation_tpu.envs.gym_wrapper import GymEnv

    env = GymEnv(dclaw_rotate.make("tactile"), seed=0)
    obs = env.reset()
    for t in range(100):
        action = np.random.uniform(-1, 1, env.ndof_u)
        obs, reward, done, info = env.step(action)
        if t % 10 == 0:
            print(f"step {t}: reward={reward:.2f} done={done}")
        if done:
            obs = env.reset()


if __name__ == "__main__":
    main()
