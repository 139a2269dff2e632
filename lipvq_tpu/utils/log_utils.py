"""Logging: stdout tee + scalar logger.

Counterpart of reference log_utils.py: ``PrintLogger`` (:21) tees stdout to
log.txt; ``DataLogger`` (:42) records scalars to tensorboard (and wandb
when configured) with running stats. Both backends are optional — a plain
in-memory record always works (hermetic CI).
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import numpy as np


class PrintLogger:
    """Tee stdout/stderr to a log file (reference log_utils.py:21-40)."""

    def __init__(self, log_file: str):
        self.terminal = sys.stdout
        self.log_file = open(log_file, "a")

    def write(self, message):
        self.terminal.write(message)
        self.log_file.write(message)
        self.log_file.flush()

    def flush(self):
        self.terminal.flush()
        self.log_file.flush()


_WARNING_BUFFER: list[str] = []


def log_warning(message: str, color: str = "yellow", print_now: bool = True):
    """Buffer a warning for later flush (reference log_utils.py:203-220)."""
    formatted = f"ROBOMIMIC WARNING(\n    {message}\n)"
    if print_now:
        print(formatted)
    _WARNING_BUFFER.append(formatted)


def flush_warnings():
    """Re-print all buffered warnings (reference log_utils.py:222-230 —
    called before training starts so setup warnings aren't lost in the
    scrollback)."""
    for w in _WARNING_BUFFER:
        print(w)
    _WARNING_BUFFER.clear()


class DataLogger:
    """Scalar/image logger with running stats (reference log_utils.py:42-172)."""

    def __init__(self, log_dir: str, config, log_tb: bool = True,
                 log_wandb: bool = False):
        self._tb = None
        self._wandb = None
        self._data = defaultdict(list)
        os.makedirs(log_dir, exist_ok=True)
        if log_tb:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        if log_wandb:
            try:
                import wandb

                wandb.init(
                    project=config.experiment.logging.wandb_proj_name,
                    name=config.experiment.name,
                    config=config.to_dict(),
                )
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def record(self, k: str, v, epoch: int, data_type: str = "scalar",
               log_stats: bool = False):
        if data_type == "scalar":
            self._data[k].append(float(v))
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), epoch)
                if log_stats:
                    stats = self.get_stats(k)
                    for sk, sv in stats.items():
                        self._tb.add_scalar(f"{k}-{sk}", sv, epoch)
            if self._wandb is not None:
                self._wandb.log({k: float(v)}, step=epoch)

    def get_stats(self, k: str) -> dict:
        vals = np.asarray(self._data[k])
        return {
            "mean": float(vals.mean()),
            "std": float(vals.std()),
            "min": float(vals.min()),
            "max": float(vals.max()),
        }

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
