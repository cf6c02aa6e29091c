#!/usr/bin/env python
"""Perf sweep for the eval hot path on the real chip: one JSON line per
variant (attention impl x batch size x param dtype). Not the headline bench
(bench.py keeps its one-line contract); this is the profiling tool that
decides what the headline configuration should be."""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(variant: str, batch_clips: int, fused: bool, params_dtype: str,
            num_frames: int = 4) -> dict:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.clip import CLIPConfig
    from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
    from fitclip_tpu.models.clip.model import fold_pixel_normalization
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=num_frames,
                                   dtype=jnp.bfloat16, fused_attention=fused,
                                   pixel_normalization_folded=True)
    params = encoder.init_params(jax.random.PRNGKey(0))
    params = fold_pixel_normalization(params, encoder.preprocess.mean,
                                      encoder.preprocess.std)
    if params_dtype == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == np.float32 else a, params)
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.integers(0, 256, size=(batch_clips, num_frames, 224, 224, 3),
                                     dtype=np.uint8))

    @jax.jit
    def chain(params, video, steps):
        def body(i, carry):
            v = video + (carry % 3).astype(jnp.uint8)
            emb = encoder.encode_video(params, v)
            return carry + (jnp.abs(emb).sum() > 0).astype(jnp.int32)
        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    t0 = time.perf_counter()
    seconds = sustained_seconds_per_step(lambda s: chain(params, video, jnp.int32(s)))
    wall = time.perf_counter() - t0
    return {
        "variant": variant,
        "batch_clips": batch_clips,
        "clips_per_sec": round(batch_clips / seconds, 1),
        "ms_per_step": round(seconds * 1e3, 2),
        "wall_incl_compile_s": round(wall, 1),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--variants", default=(
        "einsum_b128_fp32,fused_b128_fp32,einsum_b256_fp32,einsum_b128_bf16,"
        "einsum_b64_fp32,fused_b256_fp32"))
    args = parser.parse_args()
    for name in args.variants.split(","):
        parts = name.split("_")
        fused = parts[0] == "fused"
        batch = int(parts[1][1:])
        pdtype = parts[2]
        result = measure(name, batch, fused, pdtype)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
