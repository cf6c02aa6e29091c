"""Profiling: device trace capture + input-pipeline stage timing.

The reference had no profiler at all (SURVEY §5.1); here both are first-class:
- `device_trace(log_dir)`: context manager around `jax.profiler` trace capture
  (view in TensorBoard / xprof).
- `StageTimer`: lightweight accumulation of host pipeline stage times (decode,
  transform, collate, device-put) so input-bound vs compute-bound is visible
  without a full trace.

Enable in the CLI with ``+profile_dir=/tmp/trace``.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {name: self.totals[name] / max(self.counts[name], 1)
                for name in self.totals}

    def report(self) -> str:
        return " | ".join(f"{name}: {avg * 1e3:.1f}ms avg ({self.counts[name]}x)"
                          for name, avg in sorted(self.summary().items()))
