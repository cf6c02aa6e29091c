"""Benchmark timing utilities for remote/async TPU backends.

Naive per-call timing is wrong on this environment's tunneled TPU backend:
dispatch is async, `block_until_ready` can return before execution completes,
and identical enqueued computations may be deduplicated. Robust method:
chain the computation N times inside one jitted `fori_loop` (data dependency
forces sequential execution), force a host fetch of the result, and take the
difference between a long and a short run to cancel the fixed relay overhead.
"""

import time
from typing import Callable

import numpy as np


def sustained_seconds_per_step(chained_fn: Callable[[int], "jax.Array"],
                               short_steps: int = 5, long_steps: int = 25,
                               trials: int = 2) -> float:
    """chained_fn(steps) must run `steps` data-dependent iterations on device
    and return an array. Returns best marginal seconds/step across trials."""
    # Warm up (compile both step counts).
    np.asarray(chained_fn(short_steps))
    np.asarray(chained_fn(long_steps))

    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(chained_fn(short_steps))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chained_fn(long_steps))
        t_long = time.perf_counter() - t0
        marginal = (t_long - t_short) / (long_steps - short_steps)
        if marginal > 0:
            best = min(best, marginal)
    return best
