"""Parity tests for the Frozen-in-Time whole-block int8 megakernel
(ops/fit_block.py + models/frozen_in_time/fit_fast.py) against the flax
paths on the same quantized parameters (CPU interpret mode; the real-chip
cosine gate lives in scripts/bench_families.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from fitclip_tpu.models.frozen_in_time.encoder import (
    FrozenInTimeConfig, FrozenInTimeVideoTextEncoder,
    quantize_fit_video_params)
from fitclip_tpu.ops.quant import apply_act_scales


def _cosine(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(((a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                     * np.linalg.norm(b, axis=-1))).min())


def test_fit_megakernel_matches_flax_int8_and_fp32():
    cfg = FrozenInTimeConfig.tiny_test()
    fp32 = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                        fused_attention=False)
    params = fp32.init_params(jax.random.PRNGKey(0))
    video = jax.random.normal(jax.random.PRNGKey(1),
                              (2, cfg.num_frames, cfg.img_size,
                               cfg.img_size, 3))

    # Separate-op int8 path = the numeric oracle for the megakernel (same
    # quantization scheme, XLA lowering).
    sep = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                       dtype="int8", fused_attention=False,
                                       fused_block=False)
    qparams = dict(params, video=quantize_fit_video_params(params["video"]))
    qparams = apply_act_scales(qparams, sep.collect_act_amax(qparams, video))
    emb_sep = sep.encode_video(qparams, video)

    mk = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                      dtype="int8", fused_attention=False,
                                      fused_block=True)
    assert mk.fused_block
    emb_mk = mk.encode_video(qparams, video)

    # Same quantized math modulo bf16 intermediate casts: tight cosine vs
    # the separate-op int8 path, and quantization-level cosine vs fp32.
    assert _cosine(emb_mk, emb_sep) > 0.9995
    assert _cosine(emb_mk, fp32.encode_video(params, video)) > 0.99


def test_fit_megakernel_partial_frames():
    """f < num_frames clips (the flax path slices the tiled embeds) must go
    through the same prologue slice in the fast path."""
    cfg = FrozenInTimeConfig.tiny_test()
    fp32 = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                        fused_attention=False)
    params = fp32.init_params(jax.random.PRNGKey(0))
    video = jax.random.normal(jax.random.PRNGKey(2),
                              (2, 1, cfg.img_size, cfg.img_size, 3))

    mk = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                      dtype="int8", fused_attention=False,
                                      fused_block=True)
    qparams = dict(params, video=quantize_fit_video_params(params["video"]))
    qparams = apply_act_scales(qparams, mk.collect_act_amax(qparams, video))
    assert _cosine(mk.encode_video(qparams, video),
                   fp32.encode_video(params, video)) > 0.99


def test_fit_split_layout_matches_joint_layout():
    """The SPLIT-layout kernel (CLS + (B,F,P,W) patch rows as separate
    operands, fused_fit_int8_layer_split) is the same math as the joint
    (B,1+F*P,W) kernel up to reduction order. It is a measured-negative
    ablation (slower e2e, scripts/bench_fit_e2e_ab.py) — the joint layout
    stays the default; this pins the split arm's numerics."""
    from fitclip_tpu.models.frozen_in_time.fit_fast import (
        encode_video_features_fast)

    cfg = FrozenInTimeConfig.tiny_test()
    fp32 = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                        fused_attention=False)
    params = fp32.init_params(jax.random.PRNGKey(0))
    video = jax.random.normal(jax.random.PRNGKey(3),
                              (2, cfg.num_frames, cfg.img_size,
                               cfg.img_size, 3))
    qparams = dict(params, video=quantize_fit_video_params(params["video"]))
    mk = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                      dtype="int8", fused_attention=False,
                                      fused_block=True)
    qparams = apply_act_scales(qparams, mk.collect_act_amax(qparams, video))

    emb_split = encode_video_features_fast(qparams["video"], video, cfg,
                                           split=True)
    emb_joint = encode_video_features_fast(qparams["video"], video, cfg,
                                           split=False)
    assert _cosine(emb_split, emb_joint) > 0.9995


def test_fit_pad8_layout_matches_joint_layout():
    """Round-4 PAD8 experiment (VERDICT r3 #2): the joint layout padded to
    sublane-aligned frame groups ([CLS | 7 dead | F x ceil8(P) rows], dead
    rows masked in-softmax) must reproduce the joint kernel's math — the
    masked exps contribute exactly zero and dead rows never feed real ones."""
    from fitclip_tpu.models.frozen_in_time.fit_fast import (
        encode_video_features_fast)

    cfg = FrozenInTimeConfig.tiny_test()
    fp32 = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                        fused_attention=False)
    params = fp32.init_params(jax.random.PRNGKey(0))
    video = jax.random.normal(jax.random.PRNGKey(5),
                              (2, cfg.num_frames, cfg.img_size,
                               cfg.img_size, 3))
    qparams = dict(params, video=quantize_fit_video_params(params["video"]))
    mk = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                      dtype="int8", fused_attention=False,
                                      fused_block=True)
    qparams = apply_act_scales(qparams, mk.collect_act_amax(qparams, video))

    emb_pad = encode_video_features_fast(qparams["video"], video, cfg,
                                         pad8=True)
    emb_joint = encode_video_features_fast(qparams["video"], video, cfg)
    assert _cosine(emb_pad, emb_joint) > 0.9995


def test_fit_timemxu_matches_lane_reduction_time_attention():
    """Round-5 timemxu: the divided TIME attention re-expressed as
    head-sum/head-expand selection matmuls (ops/fit_block._time_attention_mxu)
    is the SAME math as the lane-reduction form — outputs must agree on both
    kernel layouts (bit-identical up to fp32 reassociation, absorbed by the
    downstream int8 quantization)."""
    from fitclip_tpu.models.frozen_in_time.fit_fast import (
        encode_video_features_fast)

    cfg = FrozenInTimeConfig.tiny_test()
    fp32 = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                        fused_attention=False)
    params = fp32.init_params(jax.random.PRNGKey(0))
    video = jax.random.normal(jax.random.PRNGKey(7),
                              (2, cfg.num_frames, cfg.img_size,
                               cfg.img_size, 3))
    qparams = dict(params, video=quantize_fit_video_params(params["video"]))
    mk = FrozenInTimeVideoTextEncoder(cfg, num_frames=cfg.num_frames,
                                      dtype="int8", fused_attention=False,
                                      fused_block=True)
    qparams = apply_act_scales(qparams, mk.collect_act_amax(qparams, video))

    for kw in ({}, {"pad8": True}):
        base = encode_video_features_fast(qparams["video"], video, cfg, **kw)
        for variant in ("timemxu", "timemxu+clscat", "timemxu+spacepack",
                        "spacepack"):
            got = encode_video_features_fast(qparams["video"], video, cfg,
                                             variant=variant, **kw)
            # clscat reassociates the softmax denominator sum; through two
            # int8 requant cascades that costs a few final-bf16 ulps.
            assert _cosine(base, got) > 0.9999, (kw, variant)
