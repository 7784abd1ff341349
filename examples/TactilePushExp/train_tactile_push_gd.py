"""Train TactilePush with analytic-gradient (BPTT) policy optimization.

Usage parity with the reference entry point:
    python train_tactile_push_gd.py --cfg cfg/gd_tactile.yaml --logdir ... \
        [--play --checkpoint M.pkl --num-games N --seed S]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "../.."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "../../.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from tactilesimulation_tpu.utils import config as cfgutil
    from tactilesimulation_tpu.utils.logging import print_info, print_ok

    args_list = ["--cfg", "./cfg/gd_tactile.yaml",
                 "--logdir", "./trained_models/",
                 "--log-interval", "1",
                 "--save-interval", "50",
                 "--render-interval", "0",
                 "--seed", "0"]
    cfgutil.solve_argv_conflict(args_list, sys.argv[1:])
    parser = cfgutil.get_gd_parser()
    args = parser.parse_args(args_list + sys.argv[1:])
    if args.device:
        jax.config.update("jax_platforms", args.device)
    # the reference trains in float64 (train_tactile_push_gd.py:13); on TPU
    # we use f32 — enable x64 only on CPU
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    cfg = cfgutil.load_cfg(args)
    cfgutil.set_random_seed(args.seed)

    from tactilesimulation_tpu import envs
    from tactilesimulation_tpu.algorithms.gd import GD

    env_params = dict(cfg["params"]["env"])
    name = env_params.pop("name")
    env = envs.make(name, **env_params)

    algo = GD(env, cfg["params"], logdir=args.logdir if args.train else None,
              seed=args.seed)
    if args.checkpoint:
        algo.load(args.checkpoint)

    if args.train:
        cfgutil.dump_cfg(cfg, args.logdir)
        algo.train()
    else:
        total = algo.evaluate(num_games=args.num_games)
        print_ok(f"[Summary] Avg reward = {total:.3f}")


if __name__ == "__main__":
    main()
