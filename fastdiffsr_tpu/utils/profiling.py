"""Profiling / accounting utilities.

Reference equivalents: thop FLOPs+param counting (model/base_model.py:52-58)
and cuda-sync wall timers (sr_mfe.py:279-284). Here:
- param_count: exact;
- flops_estimate: XLA's own cost analysis of the jitted fn (more honest
  than thop's per-module hooks);
- trace(): jax.profiler wrapper producing a TensorBoard-loadable trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


def param_count(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def flops_estimate(fn: Callable, *args) -> dict:
    """Compile fn and return XLA cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
    }


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """steps/sec & images/sec counter."""

    def __init__(self):
        self.t0 = time.time()
        self.steps = 0
        self.images = 0

    def update(self, batch_size: int):
        self.steps += 1
        self.images += batch_size

    def rates(self) -> dict:
        dt = max(time.time() - self.t0, 1e-9)
        return {"steps_per_sec": self.steps / dt,
                "images_per_sec": self.images / dt}
