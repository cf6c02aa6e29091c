#!/usr/bin/env python
"""Device-trace the CLIP RN50 eval forward and aggregate per-op time.

This trace found the round-3 session-2 RN50 dtype bug (the tower ignored
encoder.dtype and ran fp32 HIGHEST convs — multi-pass emulated on v5e,
~5% MFU). Kept for regression profiling; trace plumbing in _trace_util.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _trace_util import print_aggregate, trace_and_aggregate


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.clip.resnet_clip import (RESNET_PRESETS,
                                                     ResNetClipVideoTextEncoder)

    batch = int(os.environ.get("BENCH_CLIPS", "32"))
    encoder = ResNetClipVideoTextEncoder(RESNET_PRESETS["RN50"], num_frames=4,
                                         dtype=jnp.bfloat16)
    params = jax.device_put(encoder.init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(batch, 4, 224, 224, 3)).astype(np.float32))

    @jax.jit
    def run(params, video, bump):
        return encoder.encode_video(params, video * (1 + bump * 1e-6))

    per_op, calls = trace_and_aggregate(
        lambda i: run(params, video, jnp.float32(i)), "/tmp/fitclip_rn50_trace")
    print_aggregate(per_op, calls, batch)


if __name__ == "__main__":
    main()
