#!/usr/bin/env python
"""Device-trace the Frozen-in-Time bf16 eval forward and aggregate per-op
time. FiT's SpaceTimeTransformer is ViT-B/16-class FLOPs yet the family
bench measures 175 clips/s vs the flax CLIP path's ~930 — pin whether the
divided space/time attention's CLS-replication concats, the fp32 LNs, or
something else owns the gap. Same trace plumbing as profile_rn50.py."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.frozen_in_time.encoder import FrozenInTimeVideoTextEncoder

    batch = int(os.environ.get("BENCH_CLIPS", "32"))
    encoder = FrozenInTimeVideoTextEncoder(num_frames=4, dtype=jnp.bfloat16)
    params = jax.device_put(encoder.init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(batch, 4, 224, 224, 3)).astype(np.float32))

    @jax.jit
    def run(params, video, bump):
        return encoder.encode_video(params, video * (1 + bump * 1e-6))

    np.asarray(run(params, video, jnp.float32(0.0)))

    trace_dir = "/tmp/fitclip_fit_trace"
    jax.profiler.start_trace(trace_dir)
    for i in range(3):
        out = run(params, video, jnp.float32(i))
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
    total = sum(per_op.values())
    print(json.dumps({"total_ms_3calls": round(total, 2),
                      "ms_per_call": round(total / 3, 2),
                      "clips_per_call": batch}), flush=True)
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(json.dumps({"op": name[:110], "ms_per_call": round(ms / 3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
