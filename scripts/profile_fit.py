#!/usr/bin/env python
"""Device-trace the Frozen-in-Time bf16 eval forward and aggregate per-op
time. This trace drove the session-2 FiT work (175 -> 268 clips/s: fused
space attention, logit-space CLS join, lane-slice time attention — see
BASELINE.md). Kept for regression profiling; plumbing in _trace_util.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _trace_util import print_aggregate, trace_and_aggregate


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.frozen_in_time.encoder import FrozenInTimeVideoTextEncoder

    batch = int(os.environ.get("BENCH_CLIPS", "32"))
    # BENCH_DTYPE=int8 traces the whole-block megakernel path (ops/fit_block).
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    encoder = FrozenInTimeVideoTextEncoder(
        num_frames=4, dtype=jnp.bfloat16 if dtype == "bfloat16" else dtype)
    params = jax.device_put(encoder.init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(batch, 4, 224, 224, 3)).astype(np.float32))
    if getattr(encoder, "quantized", False):
        params = jax.device_put(
            encoder.calibrate(jax.device_get(params), video[:8]))

    @jax.jit
    def run(params, video, bump):
        return encoder.encode_video(params, video * (1 + bump * 1e-6))

    per_op, calls = trace_and_aggregate(
        lambda i: run(params, video, jnp.float32(i)), "/tmp/fitclip_fit_trace")
    print_aggregate(per_op, calls, batch)


if __name__ == "__main__":
    main()
