"""Profiling / tracing harness.

Counterpart of reference per-phase timers (train_utils.py:1279-1328 —
kept as Time_* keys in run_epoch) extended with the TPU-native tracer
SURVEY.md §5.1 calls for: ``jax.profiler`` traces viewable in
TensorBoard/Perfetto, plus a block_until_ready timing helper that
accounts for the async dispatch (and the axon relay's enqueue-only
block_until_ready — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open in TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, iters: int = 10, warmup: int = 2,
           fetch: bool = True) -> dict:
    """Median wall time of a jitted fn.

    With ``fetch`` (default) the result is pulled to host each iteration —
    required under remote-execution tunnels where block_until_ready
    returns at enqueue; the k-iteration amortized form divides the
    one-time fetch latency away.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    if fetch:
        # amortized: enqueue iters dependent calls, fetch once
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        total = time.time() - t0
        return {"mean_s": total / iters, "iters": iters, "mode": "amortized"}
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    return {
        "mean_s": float(np.mean(times)),
        "p50_s": float(np.median(times)),
        "iters": iters,
        "mode": "block_until_ready",
    }


class PhaseTimer:
    """Accumulating per-phase wall-clock timer emitting Time_* minutes
    (the reference's run_epoch timing keys)."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def logs(self) -> dict:
        return {f"Time_{k}": v / 60.0 for k, v in self.totals.items()}
