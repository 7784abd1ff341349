"""Kill/resume fidelity: training 2+2 epochs through a full-state checkpoint
must reproduce an uninterrupted 4-epoch run exactly (params, opt state,
obs_rms, PRNG stream). This is the §5.4 upgrade over the reference, which
checkpoints only [policy, obs_rms] (torch.save) and loses Adam state + the
epoch counter on restart (/root/reference/algorithms/gd.py:186-194)."""

import jax
import numpy as np

from tactilesimulation_tpu.algorithms.gd import GD
from tactilesimulation_tpu.envs import pendulum
import pytest

pytestmark = pytest.mark.slow  # compile-bound: minutes on the CPU mesh

CFG = {"config": {"num_epochs": 4, "num_episodes": 4, "lr": 1e-2,
                  "obs_rms": True},
       "network": {"actor_mlp": {"layer_sizes": [8], "activation": "elu"}}}


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_checkpoint_resume_reproduces_uninterrupted_run(tmp_path):
    a = GD(pendulum.make(), CFG, logdir=str(tmp_path / "a"), seed=0)
    a.train()

    # interrupted run: 2 epochs, "crash", fresh object, resume, finish
    b1 = GD(pendulum.make(), CFG, logdir=str(tmp_path / "b"), seed=0)
    b1.train(stop_epoch=2)

    b2 = GD(pendulum.make(), CFG, logdir=str(tmp_path / "b2"), seed=123)
    b2.resume(str(tmp_path / "b" / "checkpoint"))
    assert b2._epoch == 2
    b2.train()

    for xa, xb in zip(_leaves(a.params), _leaves(b2.params)):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)
    for xa, xb in zip(_leaves(a.obs_rms), _leaves(b2.obs_rms)):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)
    for xa, xb in zip(_leaves(a.opt_state), _leaves(b2.opt_state)):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)


PPO_CFG = {
    "network": {"actor": "DiagGaussianActor",
                "actor_mlp": {"layer_sizes": [16], "activation": "elu"},
                "actor_logstd_init": 0.0,
                "critic": "MLPCritic",
                "critic_mlp": {"layer_sizes": [16], "activation": "elu"}},
    "config": {"num_env_steps": 4 * 16 * 4, "num_steps": 16,
               "num_processes": 4, "lr": 3e-4, "ppo_epoch": 2,
               "num_mini_batch": 2, "save_interval": 1},
}


def test_ppo_checkpoint_resume_reproduces_uninterrupted_run(tmp_path):
    from tactilesimulation_tpu.algorithms.ppo import PPO
    env = pendulum.make()
    env.max_episode_steps = 10

    a = PPO(env, PPO_CFG, logdir=str(tmp_path / "a"), seed=0)
    a.train()

    b1 = PPO(env, PPO_CFG, logdir=str(tmp_path / "b"), seed=0)
    b1.train(stop_update=2)

    b2 = PPO(env, PPO_CFG, logdir=str(tmp_path / "b2"), seed=123)
    b2.resume(str(tmp_path / "b" / "checkpoint"))
    assert int(b2._resume_blob["update"]) == 2
    b2.train()

    for xa, xb in zip(_leaves(a.params), _leaves(b2.params)):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)
    for xa, xb in zip(_leaves(a.opt_state), _leaves(b2.opt_state)):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)
    for xa, xb in zip(_leaves(a.norm), _leaves(b2.norm)):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)


def test_ppo_rnn_checkpoint_resume_reproduces_uninterrupted_run(tmp_path):
    from tactilesimulation_tpu.algorithms.ppo_rnn import PPORNN
    env = pendulum.make()
    env.max_episode_steps = 10
    cfg = {
        "network": {"feature_mlp": {"layer_sizes": [16],
                                    "activation": "elu"},
                    "rnn_hidden_size": 8, "rnn_hidden_layers": 1,
                    "actor_mlp": {"layer_sizes": [16], "activation": "elu"},
                    "actor_logstd_init": 0.0,
                    "critic_mlp": {"layer_sizes": [16],
                                   "activation": "elu"}},
        "config": {"num_env_steps": 4 * 16 * 4, "num_steps": 16,
                   "num_processes": 4, "lr": 3e-4, "ppo_epoch": 2,
                   "num_mini_batch": 2, "save_interval": 1},
    }

    a = PPORNN(env, cfg, logdir=str(tmp_path / "a"), seed=0)
    a.train()

    b1 = PPORNN(env, cfg, logdir=str(tmp_path / "b"), seed=0)
    b1.train(stop_update=2)

    b2 = PPORNN(env, cfg, logdir=str(tmp_path / "b2"), seed=123)
    b2.resume(str(tmp_path / "b" / "checkpoint"))
    assert int(b2._resume_blob["update"]) == 2
    b2.train()

    for xa, xb in zip(_leaves(a.params), _leaves(b2.params)):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)
    for xa, xb in zip(_leaves(a.opt_state), _leaves(b2.opt_state)):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)
    for xa, xb in zip(_leaves(a.norm), _leaves(b2.norm)):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)
