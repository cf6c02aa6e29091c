"""Headline benchmark: zero-shot video eval throughput (clips/sec/chip).

Measures the flagship eval hot path on one chip: uint8 frames in HBM ->
pixel-normalization-folded CLIP ViT-B/16 (bf16) -> L2-normalized frame-mean
clip embeddings. 4 uniform frames per clip, 224x224, matching the reference
eval configuration (aligner/encoder/clip_video_text_encoder.py:69,106-133).

Timing uses chained in-loop execution with host-fetch barriers (see
fitclip_tpu/utils/benchmarking.py) because the tunneled TPU backend is async
and dedups identical dispatches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 5000 clips/sec/chip (BASELINE.md target for v5e).
"""

import json

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.clip import CLIPConfig
    from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
    from fitclip_tpu.models.clip.model import fold_pixel_normalization
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=4,
                                   dtype=jnp.bfloat16, fused_attention=True,
                                   pixel_normalization_folded=True)
    params = encoder.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(fold_pixel_normalization(
        params, encoder.preprocess.mean, encoder.preprocess.std))

    batch_clips = int(__import__("os").environ.get("BENCH_CLIPS", "128"))

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.integers(0, 256, size=(batch_clips, 4, 224, 224, 3),
                                     dtype=np.uint8))

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

    # Real-hardware kernel numerics gate (VERDICT weak #7): the fused Pallas
    # path must match the einsum path ON THE TPU LOWERING, not just the CPU
    # interpreter, so kernel regressions can't hide behind throughput noise.
    reference_encoder = ClipVideoTextEncoder(
        CLIPConfig.vit_b_16(), num_frames=4, dtype=jnp.bfloat16,
        fused_attention=False, pixel_normalization_folded=True)
    small = video[:4]
    fused_emb = np.asarray(jax.jit(encoder.encode_video)(params, small),
                           dtype=np.float32)
    einsum_emb = np.asarray(jax.jit(reference_encoder.encode_video)(params, small),
                            dtype=np.float32)
    cosine = (fused_emb * einsum_emb).sum(-1) / (
        np.linalg.norm(fused_emb, axis=-1) * np.linalg.norm(einsum_emb, axis=-1))
    assert cosine.min() > 0.999, f"fused-vs-einsum TPU mismatch: {cosine.min()}"

    # Dynamic trip count -> ONE compile for both step counts (remote Pallas
    # compiles are minutes each).
    seconds = sustained_seconds_per_step(
        lambda s: chain(params, video, jnp.int32(s)))
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
