"""Multi-process (DCN-path) runtime test: 2 local processes x 2 CPU devices
form a 4-device global mesh via jax.distributed; an episode-sharded gradient
step must reproduce the single-process gradient on every process.

This is the host-level scale-out path that replaces the reference's
SubprocVecEnv (a2c_ppo_acktr/envs.py:105-108) — see parallel/distributed.py.
"""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    outs = [str(tmp_path / f"g{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), outs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        logs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    for path in outs:
        blob = np.load(path)
        np.testing.assert_allclose(blob["g"], blob["g_ref"], rtol=1e-6)
