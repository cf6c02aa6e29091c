#!/usr/bin/env python
"""Standalone FiT whole-block megakernel timing at eval shape (32 clips,
785 tokens, W=768): block_rows sweep + variant forensics. Relay-safe timing
per fitclip_tpu/utils/benchmarking.py. One JSON line per case.

Usage: python scripts/bench_fit_block.py [block_rows ...]   (default: 1 2 4)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.frozen_in_time.encoder import (
        FrozenInTimeConfig, FrozenInTimeVideoTextEncoder,
        quantize_fit_video_params)
    from fitclip_tpu.ops.fit_block import fused_fit_int8_layer
    from fitclip_tpu.ops.quant import apply_act_scales
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    blocks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    batch = int(os.environ.get("BENCH_CLIPS", "32"))
    cfg = FrozenInTimeConfig()
    enc = FrozenInTimeVideoTextEncoder(cfg, dtype="int8",
                                       fused_attention=False,
                                       fused_block=False)
    rng = np.random.default_rng(0)
    params = enc.init_params(jax.random.PRNGKey(0))
    video = jnp.asarray(rng.normal(
        size=(8, cfg.num_frames, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    params = apply_act_scales(params, enc.collect_act_amax(params, video))
    layer = jax.device_put(params["video"]["blocks_0"])

    n = 1 + cfg.num_frames * (cfg.img_size // cfg.patch_size) ** 2
    x = jnp.asarray(rng.normal(size=(batch, n, cfg.embed_dim)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    for block_rows in blocks:
        @jax.jit
        def chain(x, steps, block_rows=block_rows):
            def body(i, carry):
                return fused_fit_int8_layer(
                    carry * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)),
                    layer, cfg.num_heads, frames=cfg.num_frames,
                    block_rows=block_rows)
            return jax.lax.fori_loop(0, steps, body, x)

        seconds = sustained_seconds_per_step(
            lambda s, x=x: chain(x, jnp.int32(s)))
        print(json.dumps({"case": f"block_rows={block_rows}",
                          "ms_per_layer": round(seconds * 1e3, 3),
                          "batch_clips": batch}), flush=True)


if __name__ == "__main__":
    main()
