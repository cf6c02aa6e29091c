"""Whole-block megakernel eval forward for Frozen-in-Time's video tower.

Mirrors SpaceTimeTransformer.__call__ (video_transformer.py) with the 12
SpaceTimeBlocks each running as ONE int8 Pallas megakernel
(ops/fit_block.py); the prologue (patch embed + cls/pos/temporal embeds) and
the final LayerNorm stay XLA ops — they are ~5% of the call. Consumes the
SAME quantized parameter tree as the flax int8 path
(quantize_fit_video_params), so calibration/persisted scales transfer
unchanged. Numeric agreement with the flax paths is asserted by
tests/test_fit_fast.py and the on-TPU int8-vs-bf16 cosine gate in
scripts/bench_families.py. Inference-only.

Reference being matched: aligner/encoder/video_transformer.py:181-340.
"""

import jax
import jax.numpy as jnp

from fitclip_tpu.ops.fit_block import (FIT_LN_EPS, fused_fit_int8_layer,
                                       fused_fit_int8_layer_pad,
                                       fused_fit_int8_layer_split)

PRECISION = jax.lax.Precision.HIGHEST


def _layer_norm(x, node, dtype, eps=FIT_LN_EPS):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    centered = xf - mean
    var = (centered * centered).mean(-1, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + eps)
    return (normed * node["weight"].astype(jnp.float32)
            + node["bias"].astype(jnp.float32)).astype(dtype)


def encode_video_features_fast(video_params, video: jnp.ndarray, config,
                               dtype=jnp.bfloat16,
                               block_rows: int = 1,
                               split: bool = False,
                               pad8: bool = False,
                               variant: str = "full") -> jnp.ndarray:
    """(B, F, H, W, 3) normalized video -> (B, embed_dim) CLS features
    through the per-block int8 megakernels. `config` is FrozenInTimeConfig
    (embed_dim/depth/num_heads/patch_size/img_size/num_frames).

    split=False (default) runs the joint (B, 1+F*P, W) kernel. split=True
    runs the SPLIT-layout ablation — CLS and the (B, F, P, W) patch rows as
    separate operands so frame access in-kernel is aligned leading-dim
    indexing. Measured NEGATIVE end-to-end on v5e (447.6 vs 572.2 clips/s,
    scripts/bench_fit_e2e_ab.py): the per-layer kernels tie (5.96 vs
    5.88 ms) but the 4-D patch operand costs more in XLA layout/prologue
    work outside the kernel than the aligned indexing saves inside. Kept
    as a tested ablation arm."""
    cfg = config
    v = video_params
    b, f = video.shape[0], video.shape[1]
    g, p = cfg.img_size // cfg.patch_size, cfg.patch_size
    patches = g * g
    width = cfg.embed_dim

    # Patch embedding as a strided conv (the CLIP/SLIP fast-path trick: XLA
    # folds the im2col into the MXU op). The (p*p*3, width) dense kernel rows
    # are ordered (ph, pw, c) — exactly HWIO when reshaped.
    x = video.astype(dtype).reshape(b * f, cfg.img_size, cfg.img_size, 3)
    kern = v["patch_embed"]["kernel"].astype(dtype).reshape(p, p, 3, width)
    x = jax.lax.conv_general_dilated(
        x, kern, window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=PRECISION)
    x = x.reshape(b, f * patches, width)

    # cls + tiled positional/temporal embeds (video_transformer.py:271-284):
    # pos row 0 belongs to cls; patch row r of frame t gets
    # pos[1 + r] + temporal[t]. Both shifts fold into one (F*P, W) add.
    pos = v["pos_embed"].astype(jnp.float32)
    temporal = v["temporal_embed"].astype(jnp.float32)
    tile_pos = jnp.tile(pos[1:], (cfg.num_frames, 1))
    tile_temporal = jnp.repeat(temporal, patches, axis=0)
    patch_shift = (v["patch_embed"]["bias"].astype(jnp.float32)
                   + tile_pos + tile_temporal)[: f * patches]
    x = x + patch_shift.astype(dtype)
    cls_row = (v["cls_token"].astype(jnp.float32) + pos[0])[None, None]
    cls = jnp.broadcast_to(cls_row.astype(dtype), (b, 1, width))

    if split:
        xp = x.reshape(b, f, patches, width)
        for i in range(cfg.depth):
            cls, xp = fused_fit_int8_layer_split(
                cls, xp, v[f"blocks_{i}"], cfg.num_heads,
                block_rows=block_rows)
        # Only the CLS row survives the head: normalize it alone.
        return _layer_norm(cls, v["norm"], dtype)[:, 0]

    if pad8:
        # PAD8 joint layout: [CLS | 7 dead | F groups of ceil8(P) rows] so
        # every in-kernel frame slice is sublane-aligned (the 1+F*P layout
        # slices at offsets ≡ 1 mod 8 — Mosaic sublane shifts). Dead rows
        # are zero-seeded once here and masked inside the kernel; cost is
        # one pad relayout at entry + (8 + F*(ceil8(P)-P))/N extra row FLOPs.
        cls_pad = 8
        group = -(-patches // 8) * 8
        xp = x.reshape(b, f, patches, width)
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, group - patches), (0, 0)))
        x = jnp.concatenate([
            cls, jnp.zeros((b, cls_pad - 1, width), dtype),
            xp.reshape(b, f * group, width)], axis=1)
        for i in range(cfg.depth):
            x = fused_fit_int8_layer_pad(x, v[f"blocks_{i}"], cfg.num_heads,
                                         frames=f, real_patches=patches,
                                         cls_pad=cls_pad,
                                         block_rows=block_rows,
                                         variant=variant)
        return _layer_norm(x[:, :1], v["norm"], dtype)[:, 0]

    x = jnp.concatenate([cls, x], axis=1)
    for i in range(cfg.depth):
        x = fused_fit_int8_layer(x, v[f"blocks_{i}"], cfg.num_heads,
                                 frames=f, block_rows=block_rows,
                                 variant=variant)
    x = _layer_norm(x, v["norm"], dtype)
    return x[:, 0]
