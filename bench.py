"""Headline benchmark: zero-shot video eval throughput (clips/sec/chip).

Measures the flagship eval hot path on one chip: uint8 frames in HBM ->
pixel-normalization-folded CLIP ViT-B/16 -> L2-normalized frame-mean clip
embeddings. 4 uniform frames per clip, 224x224, matching the reference eval
configuration (aligner/encoder/clip_video_text_encoder.py:69,106-133).

Default configuration is the calibrated int8 W8A8 path (bf16 activations,
int8 block denses, fused Pallas attention) — the quality-gated production
inference config. Two gates run ON THE REAL TPU LOWERING every time, so
kernel or quantization regressions can't hide behind throughput noise:

  1. fused-vs-einsum bf16 attention cosine > 0.999
  2. int8-vs-bf16 embedding cosine      > 0.999

Set BENCH_DTYPE=bf16 for the float configuration, BENCH_CLIPS for the batch.

Timing uses chained in-loop execution with host-fetch barriers (see
fitclip_tpu/utils/benchmarking.py) because the tunneled TPU backend is async
and dedups identical dispatches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 5000 clips/sec/chip (BASELINE.md target for v5e).
"""

import json
import os

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.clip import CLIPConfig
    from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
    from fitclip_tpu.models.clip.model import fold_pixel_normalization
    from fitclip_tpu.ops.quant import quantize_clip_params
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    bench_dtype = os.environ.get("BENCH_DTYPE", "int8")
    batch_clips = int(os.environ.get("BENCH_CLIPS", "128"))

    bf16_encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=4,
                                        dtype=jnp.bfloat16, fused_attention=True,
                                        pixel_normalization_folded=True)
    params = bf16_encoder.init_params(jax.random.PRNGKey(0))
    params = fold_pixel_normalization(params, bf16_encoder.preprocess.mean,
                                      bf16_encoder.preprocess.std)

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.integers(0, 256, size=(batch_clips, 4, 224, 224, 3),
                                     dtype=np.uint8))
    small = video[:4]

    def cosine(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return ((a * b).sum(-1) /
                (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))).min()

    # Gate 1: fused Pallas attention vs einsum attention, real TPU lowering.
    einsum_encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=4,
                                          dtype=jnp.bfloat16, fused_attention=False,
                                          pixel_normalization_folded=True)
    bf16_emb = jax.jit(bf16_encoder.encode_video)(params, small)
    einsum_emb = jax.jit(einsum_encoder.encode_video)(params, small)
    gate1 = cosine(bf16_emb, einsum_emb)
    assert gate1 > 0.999, f"fused-vs-einsum TPU mismatch: {gate1}"
    # The causal (text) path takes a different mask branch in the kernel.
    ids = np.zeros((4, 77), np.int32)
    for row in range(4):
        n = int(rng.integers(5, 70))
        ids[row, :n] = rng.integers(1, 49407, n)
        ids[row, n] = 49407
    text_small = jnp.asarray(ids)
    gate1t = cosine(jax.jit(bf16_encoder.encode_text)(params, text_small),
                    jax.jit(einsum_encoder.encode_text)(params, text_small))
    assert gate1t > 0.999, f"fused-vs-einsum causal TPU mismatch: {gate1t}"

    if bench_dtype == "int8":
        encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=4,
                                       dtype=jnp.bfloat16, fused_attention=True,
                                       pixel_normalization_folded=True,
                                       quantized=True)
        calib_text = jnp.asarray(rng.integers(1, 49408, size=(32, 77)).astype(np.int32))
        bench_params = quantize_clip_params(params)
        bench_params = encoder.calibrate(bench_params, video[:8], calib_text)
        bench_params = jax.device_put(bench_params)
        # Gate 2: int8 vs bf16 embedding parity on the real chip — video
        # (non-causal megakernel) AND text (causal megakernel).
        int8_emb = jax.jit(encoder.encode_video)(bench_params, small)
        gate2 = cosine(int8_emb, bf16_emb)
        assert gate2 > 0.999, f"int8-vs-bf16 TPU mismatch: {gate2}"
        gate2t = cosine(jax.jit(encoder.encode_text)(bench_params, text_small),
                        jax.jit(bf16_encoder.encode_text)(params, text_small))
        assert gate2t > 0.999, f"int8-vs-bf16 text TPU mismatch: {gate2t}"
    else:
        # Timed bf16 config = the float whole-layer megakernel (weights
        # VMEM-resident, carry aliased); gate 3 pins it to the flax path.
        encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=4,
                                       dtype=jnp.bfloat16, fused_attention=True,
                                       pixel_normalization_folded=True,
                                       fused_block=True)
        bench_params = jax.device_put(params)
        gate3 = cosine(jax.jit(encoder.encode_video)(bench_params, small),
                       bf16_emb)
        assert gate3 > 0.999, f"bf16 megakernel-vs-flax TPU mismatch: {gate3}"

    @jax.jit
    def chain(params, video, steps):
        def body(i, carry):
            # Perturb the uint8 input with the iteration index so no two steps
            # are identical, then encode; fold the embedding back into the
            # carry to create the data dependency.
            v = video + (carry % 3).astype(jnp.uint8)
            emb = encoder.encode_video(params, v)
            return carry + (jnp.abs(emb).sum() > 0).astype(jnp.int32)
        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    # Dynamic trip count -> ONE compile for both step counts (remote Pallas
    # compiles are minutes each).
    seconds = sustained_seconds_per_step(
        lambda s: chain(bench_params, video, jnp.int32(s)))
    clips_per_sec = batch_clips / seconds
    baseline = 5000.0
    print(json.dumps({
        "metric": "clip_vit_b16_eval_throughput",
        "value": round(clips_per_sec, 1),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
