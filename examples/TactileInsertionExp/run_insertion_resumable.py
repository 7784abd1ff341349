"""Crash-resilient driver for the PPO-RNN insertion protocol.

TPU worker crashes killed the round-4 run before one update completed
(artifacts/ppo_rnn_insertion_seed0/stdout.log) and nothing was resumable.
This driver launches train_tactile_insertion_ppo.py into a FIXED logdir
(--no-time-stamp) and, on any non-zero exit, relaunches with
``--resume <logdir>/checkpoint`` — the full-state checkpoint the trainer
writes every ``save_interval`` updates — until the run completes or retries
are exhausted. A TPU worker crash now loses at most one interval.

    python run_insertion_resumable.py --logdir trained_models/run0 \
        [--cfg cfg/tactile_insertion_trans_and_rot.yaml] [--seed 0]
"""

import argparse
import os
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg",
                    default="cfg/tactile_insertion_trans_and_rot.yaml")
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-interval", type=int, default=10)
    ap.add_argument("--max-retries", type=int, default=50)
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra flags forwarded to the train script")
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    logdir = os.path.abspath(os.path.join(here, args.logdir)) \
        if not os.path.isabs(args.logdir) else args.logdir
    ckpt = os.path.join(logdir, "checkpoint")

    for attempt in range(args.max_retries + 1):
        cmd = [sys.executable,
               os.path.join(here, "train_tactile_insertion_ppo.py"),
               "--cfg", args.cfg, "--logdir", logdir, "--no-time-stamp",
               "--seed", str(args.seed),
               "--save-interval", str(args.save_interval)] + args.extra
        if os.path.exists(ckpt) or os.path.exists(ckpt + ".pkl"):
            cmd += ["--resume", ckpt]
        print(f"[driver] attempt {attempt}: {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd, cwd=here)
        if rc == 0:
            print("[driver] training completed", flush=True)
            return True
        print(f"[driver] training exited rc={rc}; retrying in 20 s",
              flush=True)
        time.sleep(20)
    print("[driver] retries exhausted", flush=True)
    return False


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
