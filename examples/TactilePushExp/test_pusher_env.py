"""Constant-action rollout smoke test for TactilePush (parity with the
reference examples/TactilePushExp/test_pusher_env.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "../.."))

import numpy as np


def main():
    from tactilesimulation_tpu.envs import tactile_push
    from tactilesimulation_tpu.envs.gym_wrapper import GymEnv

    env = GymEnv(tactile_push.make("tactile_flatten"), seed=0)
    obs = env.reset()
    total = 0.0
    for t in range(100):
        obs, reward, done, info = env.step(np.array([1.0, 0.0, 0.0]))
        total += reward
        if t % 20 == 0:
            print(f"step {t}: reward={reward:.3f} "
                  f"pos_err={float(info['final_pos_error']):.4f}")
    print(f"episode reward: {total:.2f}")


if __name__ == "__main__":
    main()
