"""PPO-RNN misalignment-class evaluation harness (reference
algorithms/ppo_rnn.py:294-433) on a stub insertion-like env — checks the 3x3
binning/aggregation logic and the figure artifact without paying the real
insertion scene's compile cost (that path is covered by tests/test_envs_heavy)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct as fstruct

from tactilesimulation_tpu.algorithms.ppo_rnn import PPORNN


@fstruct.dataclass
class _StubState:
    pose: jax.Array
    t: jax.Array


class _StubEnv:
    """Deterministic pose sequence crossing all misalignment classes."""
    max_episode_steps = 6
    ndof_u = 2

    def obs_size(self):
        return (4,)

    def reset(self, key):
        pose = jnp.array([-0.004, 0.004, 0.1])
        return _StubState(pose=pose, t=jnp.zeros((), jnp.int32)), jnp.zeros(4)

    def step(self, state, action):
        # drift toward alignment; success once inside the centre cell
        pose = state.pose * 0.5
        t = state.t + 1
        success = (jnp.abs(pose[0]) < 0.00225) & (jnp.abs(pose[1]) < 0.00225)
        info = {"success": success, "improve": jnp.ones((), bool),
                "prev_object_pose": state.pose}
        return (_StubState(pose=pose, t=t), jnp.zeros(4), jnp.ones(()),
                success, info)


def test_play_matrices(tmp_path):
    cfg = {"config": {"num_processes": 2, "num_steps": 4,
                      "num_env_steps": 8, "num_mini_batch": 2},
           "network": {"feature_mlp": {"layer_sizes": [8],
                                       "activation": "elu"},
                       "rnn_hidden_size": 8, "rnn_hidden_layers": 1,
                       "actor_mlp": {"layer_sizes": [8], "activation": "elu"},
                       "critic_mlp": {"layer_sizes": [8],
                                      "activation": "elu"},
                       "actor_logstd_init": -1.0}}
    algo = PPORNN(_StubEnv(), cfg, logdir=None, seed=0)
    plot = str(tmp_path / "eval.png")
    out = algo.play(num_games=3, plot_path=plot)
    assert out["success_rate"] == 1.0             # stub always converges
    assert out["class_cnt"].sum() > 0
    # first step of every episode starts at (-0.004, 0.004) -> class [0, 2];
    # success binned by the same pre-step class (reference ppo_rnn.py:316-338)
    assert out["class_cnt"][0][2] >= 3
    assert out["class_success_cnt"][0][2] >= 3
    # steps-to-success (round-4 metric): the stub halves the pose each step
    # from (-4, 4) mm, so the first success (|x|,|y| < 2.25 mm) is step 1
    assert out["steps_to_success_mean"] == 1.0
    assert out["steps_to_success_median"] == 1.0
    assert len(out["steps_to_success"]) == 3
    import os
    assert os.path.exists(plot)
