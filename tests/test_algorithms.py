"""End-to-end trainer validation on the cheap pendulum env: GD improves the
BPTT objective, PPO and recurrent PPO run full update iterations and improve
or at least remain finite/stable over a few updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesimulation_tpu.envs import pendulum

pytestmark = pytest.mark.slow  # compile-bound: minutes on the CPU mesh


@pytest.fixture(scope="module")
def env():
    e = pendulum.make()
    e.max_episode_steps = 30
    return e


def test_gd_improves(env):
    from tactilesimulation_tpu.algorithms.gd import GD
    cfg = {
        "network": {"actor": "DiagGaussianActor",
                    "actor_mlp": {"layer_sizes": [32, 32],
                                  "activation": "elu"},
                    "actor_logstd_init": -1.0},
        "config": {"num_epochs": 15, "num_episodes": 8, "lr": 2e-2,
                   "truncate_grads": True, "grad_norm": 1.0,
                   "betas": [0.7, 0.95], "lr_schedule": "linear"},
    }
    algo = GD(env, cfg, logdir=None, seed=0)
    r0 = algo.evaluate(num_games=4)
    algo.train()
    r1 = algo.evaluate(num_games=4)
    assert np.isfinite(r1)
    assert r1 > r0, f"GD did not improve: {r0:.2f} -> {r1:.2f}"


def test_gd_gradient_check(env):
    from tactilesimulation_tpu.algorithms.gd import GD
    cfg = {
        "network": {"actor": "DiagGaussianActor",
                    "actor_mlp": {"layer_sizes": [16], "activation": "elu"},
                    "actor_logstd_init": -1.0},
        "config": {"num_epochs": 1, "num_episodes": 2, "lr": 1e-2,
                   "betas": [0.9, 0.999]},
    }
    algo = GD(env, cfg, logdir=None, seed=0)
    results = algo.test_gradient(num_params=10, eps_list=(1e-5,))
    abs_err, rel_err, cos = results[0]
    assert cos > 0.999, f"BPTT policy gradient vs FD cosine {cos}"


def test_ppo_runs_and_learns_sign(env):
    from tactilesimulation_tpu.algorithms.ppo import PPO
    cfg = {
        "network": {"actor": "DiagGaussianActor",
                    "actor_mlp": {"layer_sizes": [32, 32],
                                  "activation": "elu"},
                    "actor_logstd_init": 0.0,
                    "critic": "MLPCritic",
                    "critic_mlp": {"layer_sizes": [32, 32],
                                   "activation": "elu"}},
        "config": {"num_env_steps": 4 * 64 * 8, "num_steps": 64,
                   "num_processes": 8, "lr": 3e-4, "ppo_epoch": 4,
                   "num_mini_batch": 4, "entropy_coef": 0.0,
                   "value_loss_coef": 0.5, "max_grad_norm": 0.5},
    }
    algo = PPO(env, cfg, logdir=None, seed=0)
    mean_r = algo.train()
    assert np.isfinite(mean_r)
    r, length, info = algo.play_once()
    assert np.isfinite(r)


def test_ppo_rnn_runs(env):
    from tactilesimulation_tpu.algorithms.ppo_rnn import PPORNN
    cfg = {
        "network": {"feature_mlp": {"layer_sizes": [32],
                                    "activation": "elu"},
                    "rnn_hidden_size": 16, "rnn_hidden_layers": 2,
                    "actor_mlp": {"layer_sizes": [32], "activation": "elu"},
                    "actor_logstd_init": 0.0,
                    "critic_mlp": {"layer_sizes": [32], "activation": "elu"}},
        "config": {"num_env_steps": 2 * 64 * 8, "num_steps": 64,
                   "num_processes": 8, "lr": 3e-4, "ppo_epoch": 2,
                   "num_mini_batch": 4},
    }
    algo = PPORNN(env, cfg, logdir=None, seed=0)
    sr = algo.train()
    assert np.isfinite(sr)
