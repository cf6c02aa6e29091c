"""Shared device-trace plumbing for the profile_* scripts.

Collects a jax.profiler trace of 3 calls of `run_fn(bump)` (the bump keeps
the async relay from deduplicating identical dispatches) and aggregates
TPU-pid op durations — per op name and per HLO category prefix.
"""

import glob
import gzip
import json
import os
import re
from collections import defaultdict


def trace_and_aggregate(run_fn, trace_dir: str, calls: int = 3):
    """run_fn(i) -> device value; returns (per_op_ms, per_call_divisor)."""
    import jax
    import numpy as np

    np.asarray(run_fn(0))  # compile outside the trace
    jax.profiler.start_trace(trace_dir)
    out = None
    for i in range(calls):
        out = run_fn(i)
    np.asarray(out)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                              recursive=True), key=os.path.getmtime)
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    tpu_pids = {e["pid"] for e in trace["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "tpu" in str(e.get("args", {}).get("name", "")).lower()} or {3}
    per_op = defaultdict(float)
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            per_op[e["name"]] += e["dur"] / 1e3
    return dict(per_op), calls


def print_aggregate(per_op, calls: int, clips: int, top: int = 30) -> None:
    """The profile_* scripts' standard output: one total line then the top
    ops, excluding the jit wrapper event (it double-counts the whole call)."""
    per_op = {k: v for k, v in per_op.items() if not k.startswith("jit_")}
    total = sum(per_op.values())
    print(json.dumps({"total_ms_%dcalls" % calls: round(total, 2),
                      "ms_per_call": round(total / calls, 2),
                      "clips_per_call": clips}), flush=True)
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(json.dumps({"op": name[:110],
                          "ms_per_call": round(ms / calls, 3)}), flush=True)


def aggregate_by_category(per_op, calls: int):
    """Group op names by their category prefix (fusion.12 -> fusion)."""
    cat = defaultdict(float)
    for name, ms in per_op.items():
        if name.startswith("jit_"):
            continue
        cat[re.sub(r"[.\d]+$", "", name)] += ms / calls
    return dict(cat)
