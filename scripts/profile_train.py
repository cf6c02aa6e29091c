#!/usr/bin/env python
"""Trace-decompose one contrastive train step on the TPU (VERDICT r2 weak #5:
train MFU got one table row, eval got three rounds of forensics).

Captures a jax.profiler device trace of a few chained steps (the relay passes
device-side XLA op timings through; memory: pid 3 = TPU), then aggregates op
time by category: fwd/bwd matmuls, attention (Pallas custom-calls), optimizer
update, transposes/relayouts, elementwise. Prints a JSON summary + the top-20
ops by total time.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def categorize(name: str) -> str:
    lower = name.lower()
    if "custom-call" in lower or "closed_call" in lower or "pallas" in lower:
        return "pallas_attention"
    if "fusion" in lower and ("conv" in lower or "dot" in lower):
        return "matmul_fusion"
    if lower.startswith("dot") or "dot_general" in lower or "convolution" in lower:
        return "matmul"
    if "transpose" in lower or "copy" in lower or "bitcast" in lower:
        return "relayout"
    if "all-reduce" in lower or "all-gather" in lower:
        return "collective"
    if "fusion" in lower:
        return "fusion_other"
    return "other"


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.clip import CLIPConfig
    from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
    from fitclip_tpu.training.state import init_train_state, make_optimizer
    from fitclip_tpu.training.steps import make_contrastive_train_step

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--no-fused", action="store_true")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--out", default="/tmp/fitclip_train_trace")
    args = parser.parse_args()

    encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=4,
                                   dtype=jnp.bfloat16,
                                   fused_attention=not args.no_fused,
                                   remat=args.remat)
    params = encoder.init_params(jax.random.PRNGKey(0))
    optimizer = make_optimizer(3e-6)
    state = jax.device_put(init_train_state(params, optimizer))
    train_step = make_contrastive_train_step(encoder, optimizer)

    rng = np.random.default_rng(0)
    size = encoder.preprocess.image_size
    batch = {
        "video": jnp.asarray(rng.normal(size=(args.batch, 4, size, size, 3))
                             .astype(np.float32), dtype=jnp.bfloat16),
        "text": jnp.asarray(rng.integers(1, 49408, size=(args.batch, 77))
                            .astype(np.int32)),
    }

    @jax.jit
    def chain(steps, state):
        def body(i, s):
            s, _ = train_step(s, batch)
            return s
        return jax.lax.fori_loop(0, steps, body, state)

    # Warm (compile) outside the trace.
    warmed = chain(jnp.int32(1), state)
    np.asarray(warmed.params["logit_scale"])  # fetch barrier

    jax.profiler.start_trace(args.out)
    out = chain(jnp.int32(args.steps), state)
    np.asarray(out.params["logit_scale"])
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                              recursive=True), key=os.path.getmtime)
    assert traces, f"no trace written under {args.out}"
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    # TPU device pid: the process whose name mentions TPU (fallback: pid 3).
    tpu_pids = {e["pid"] for e in trace["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "tpu" in str(e.get("args", {}).get("name", "")).lower()}
    if not tpu_pids:
        tpu_pids = {3}

    per_op = defaultdict(float)
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            per_op[e["name"]] += e["dur"] / 1e3  # us -> ms

    per_cat = defaultdict(float)
    for name, ms in per_op.items():
        per_cat[categorize(name)] += ms
    total = sum(per_cat.values())

    print(json.dumps({
        "config": {"batch": args.batch, "remat": args.remat,
                   "fused": not args.no_fused, "steps": args.steps},
        "total_device_ms": round(total, 2),
        "ms_per_step": round(total / args.steps, 2),
        "by_category_ms": {k: round(v, 2) for k, v in
                           sorted(per_cat.items(), key=lambda kv: -kv[1])},
    }), flush=True)
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:20]
    for name, ms in top:
        print(json.dumps({"op": name[:120], "ms": round(ms, 3),
                          "ms_per_step": round(ms / args.steps, 3)}), flush=True)


if __name__ == "__main__":
    main()
