"""Random-policy smoke test for StableGrasp (parity with the reference
examples/StableGraspExp/test_stable_grasp_env.py: random actions,
reset-on-done loop)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "../.."))

import numpy as np


def main():
    from tactilesimulation_tpu.envs import stable_grasp
    from tactilesimulation_tpu.envs.gym_wrapper import GymEnv

    env = GymEnv(stable_grasp.make("tactile_map"), seed=0)
    obs = env.reset()
    for t in range(20):
        action = np.random.uniform(-1, 1, env.ndof_u)
        obs, reward, done, info = env.step(action)
        print(f"step {t}: reward={reward:.2f} done={done} "
              f"success={bool(info.get('success', False))}")
        if done:
            obs = env.reset()


if __name__ == "__main__":
    main()
