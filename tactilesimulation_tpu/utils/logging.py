"""Training observability: console printers, logs.txt, TensorBoard scalars.

Mirrors the reference's logging surface (SURVEY.md §5.5): ANSI console
messages (utils/common.py:53-71), per-update plain-text logs.txt appends, and
TensorBoard scalar streams — falling back to a JSONL event file when
tensorboardX is unavailable."""

from __future__ import annotations

import json
import os
import time


def print_ok(*message):
    print("\033[92m", *message, "\033[0m")


def print_info(*message):
    print("\033[96m", *message, "\033[0m")


def print_warning(*message):
    print("\033[93m", *message, "\033[0m")


def print_error(*message):
    print("\033[91m", *message, "\033[0m")
    raise RuntimeError(" ".join(str(m) for m in message))


class SummaryWriter:
    """TensorBoard writer with JSONL fallback."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter
            self._tb = TBWriter(logdir)
        except Exception:
            self._fp = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))
        else:
            self._fp.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "time": time.time()}) + "\n")

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        else:
            self._fp.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        else:
            self._fp.close()


class TextLog:
    """Plain-text training log (reference logs.txt, algorithms/ppo.py:257)."""

    def __init__(self, path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        open(path, "w").close()

    def append(self, line):
        with open(self.path, "a") as fp:
            fp.write(line + "\n")
