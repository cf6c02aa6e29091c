"""Whole-SpaceTimeBlock int8 megakernel for Frozen-in-Time (inference).

One Pallas call per FiT residual block (reference math:
aligner/encoder/video_transformer.py:141-178):

    t = x + timeattn(norm3(x))          # divided TIME attention, global CLS
    s = x + attn(norm1(t))              # divided SPACE attention, global CLS
    y = s + mlp(norm2(s))               # fc1 -> exact GELU -> fc2

Rationale (v5e, BASELINE.md round-3): after the separate-op int8 denses the
call still spends ~25 ms/32-clip call on LN/quant/residual HBM round trips —
every stage reads and writes the (B, 785, W) activations. Fusing the block
keeps exactly one read (x) and one write (y) of (B, N, W) bf16 per layer;
qkv tensors, logits, residuals and epilogues never leave VMEM. All six
denses run int8 W8A8 (weights VMEM-resident across the batch grid via
constant index maps); LN statistics, softmax and residuals stay fp32.

The attention formulations are the measured-fastest in-kernel shapes from
ops/attention.py, inlined:
- SPACE: per-(frame, head) lane-slice attention — Q/K/V are 64-lane slices
  of the in-VMEM qkv, QK^T contracts lane axes (no pack, no K transpose);
  the clip's CLS key/value joins each frame's softmax as index 0 in logit
  space. The int8 requant multiplier rides the softmax normalizer.
- TIME: natural-layout divided attention — the (f, g) logits are VPU lane
  reductions over row slices (F=4 is too shallow for the MXU), softmax an
  unrolled max/exp/sum chain over F+1 values, AV broadcast-FMAs.
- CLS row: one global-attention query over the full sequence per half.

The MLP half reuses the folded exact-GELU epilogue proven in ops/block.py
(requant scale folded into the dequant affine, erf via the A&S 7.1.26
polynomial — Mosaic has no erf lowering).

Inference-only (static calibrated activation scales, no VJP): the einsum /
separate-op paths in models/frozen_in_time/ stay the parity + training
surfaces.
"""

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fitclip_tpu.ops.block import LOG2E, _int8_dense, _ln, _quant
from fitclip_tpu.ops.quant import QUANT_EPS

FIT_LN_EPS = 1e-6


def _cls_global_row(qkv, heads: int, scale: float, out_mul, key_mask=None,
                    nq: int = 1):
    """The CLS token's attention over the FULL (BB, N, 3W) qkv: one query
    row per head, softmax over all N keys; the requant multiplier rides the
    normalizer. Returns (BB, nq, W) fp32 (pre-scaled by out_mul).
    key_mask (1, 1, N) of 0/-inf excludes dead rows in the pad8 layout;
    nq>1 runs the first nq rows as queries (pad8: the whole 8-row CLS block
    — rows 1..7 are dead and produce harmless junk, but the sublane-aligned
    block avoids a ragged 7-row zero concat Mosaic can't lower)."""
    block_b, n, triple_w = qkv.shape
    width = triple_w // 3
    head_dim = width // heads
    scale_q = jnp.asarray(scale, qkv.dtype)

    parts = []
    for h in range(heads):
        cq = qkv[:, :nq, h * head_dim:(h + 1) * head_dim] * scale_q
        kh = qkv[:, :, width + h * head_dim:width + (h + 1) * head_dim]
        vh = qkv[:, :, 2 * width + h * head_dim:2 * width + (h + 1) * head_dim]
        logits = jax.lax.dot_general(
            cq, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (BB, 1, N)
        if key_mask is not None:
            logits = logits + key_mask
        peak = jnp.max(logits, axis=-1, keepdims=True)
        exps = jnp.exp(logits - peak)
        denom = jnp.sum(exps, axis=-1, keepdims=True)
        weights = (exps * (out_mul / denom)).astype(vh.dtype)
        parts.append(jax.lax.dot_general(
            weights, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))  # (BB, 1, D)
    return jnp.concatenate(parts, axis=2)


def _space_attention(qkv, heads: int, frames: int, patches: int,
                     scale: float, out_mul, cls_pad: int = 1, col_mask=None,
                     with_cls: bool = True, cls_concat: bool = False):
    """Divided SPACE attention on in-VMEM qkv (BB, 1+F*P, 3W): per frame the
    patch rows attend within the frame plus the clip's global CLS key/value
    (joined in logit space as index 0). Per-(frame, head) lane-slice form.
    Returns (BB, F*P, W) fp32 pre-scaled by out_mul (patch rows only).
    cls_pad/col_mask serve the pad8 layout: frame groups start at
    cls_pad + f*patches and col_mask (1, 1, P) -infs the dead columns."""
    block_b, n, triple_w = qkv.shape
    width = triple_w // 3
    head_dim = width // heads
    scale_q = jnp.asarray(scale, qkv.dtype)

    frame_parts = []
    for f in range(frames):
        lo = cls_pad + f * patches
        head_parts = []
        for h in range(heads):
            off_q = h * head_dim
            off_k = width + h * head_dim
            off_v = 2 * width + h * head_dim
            q = qkv[:, lo:lo + patches, off_q:off_q + head_dim] * scale_q
            k = qkv[:, lo:lo + patches, off_k:off_k + head_dim]
            v = qkv[:, lo:lo + patches, off_v:off_v + head_dim]
            g_k = qkv[:, :1, off_k:off_k + head_dim]  # (BB, 1, D)
            g_v = qkv[:, :1, off_v:off_v + head_dim]
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (BB, P, P)
            if col_mask is not None:
                logits = logits + col_mask
            if with_cls and cls_concat:
                # The pre-round-5 formulation, kept as the `clscat` timing
                # arm: lane-concat the CLS logit column, slice it back off.
                cls_l = jax.lax.dot_general(
                    q, g_k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (BB, P, 1)
                cat = jnp.concatenate([cls_l, logits], axis=-1)
                peak = jnp.max(cat, axis=-1, keepdims=True)
                exps = jnp.exp(cat - peak)
                denom = jnp.sum(exps, axis=-1, keepdims=True)
                weights = (exps * (out_mul / denom)).astype(v.dtype)
                out = jax.lax.dot_general(
                    weights[:, :, 1:], v,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (BB, P, D)
                out = out + weights[:, :, :1].astype(jnp.float32) * \
                    g_v.astype(jnp.float32)
            elif with_cls:
                # CLS joins the softmax WITHOUT a lane concat (the round-5
                # attribution arms priced the CLS-global join at ~13 ms of
                # the 56 ms call; the (P, P)->(P, 1+P) concat and the
                # [:, :, 1:] slice back were Mosaic relayouts, 48/layer).
                # Same formulation as _space_attention_split: the CLS logit
                # is a separate (BB, P, 1) column through max/exp/sum.
                cls_l = jax.lax.dot_general(
                    q, g_k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (BB, P, 1)
                peak = jnp.maximum(jnp.max(logits, -1, keepdims=True), cls_l)
                exps = jnp.exp(logits - peak)
                cls_e = jnp.exp(cls_l - peak)
                inv = out_mul / (jnp.sum(exps, -1, keepdims=True) + cls_e)
                out = jax.lax.dot_general(
                    (exps * inv).astype(v.dtype), v,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (BB, P, D)
                out = out + (cls_e * inv) * g_v.astype(jnp.float32)
            else:
                peak = jnp.max(logits, axis=-1, keepdims=True)
                exps = jnp.exp(logits - peak)
                denom = jnp.sum(exps, axis=-1, keepdims=True)
                out = jax.lax.dot_general(
                    (exps * (out_mul / denom)).astype(v.dtype), v,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (BB, P, D)
            head_parts.append(out)
        frame_parts.append(jnp.concatenate(head_parts, axis=2))
    return jnp.concatenate(frame_parts, axis=1)


def _time_attention(qkv, heads: int, frames: int, patches: int,
                    scale: float, out_mul, cls_pad: int = 1,
                    with_cls: bool = True):
    """Divided TIME attention in natural layout (ops/attention.py
    _time_attention_kernel math): query frame f at location p attends over
    [CLS | frames g] at the same p; logits are lane reductions, softmax an
    unrolled chain over F+1 values, AV broadcast-FMAs. Returns
    (BB, F*P, W) fp32 pre-scaled by out_mul."""
    block_b, n, triple_w = qkv.shape
    width = triple_w // 3
    head_dim = width // heads

    frame_outs = [[] for _ in range(frames)]  # [f][head] -> (BB, P, D)
    for h in range(heads):
        off_q = h * head_dim
        off_k = width + h * head_dim
        off_v = 2 * width + h * head_dim

        def rows(off, f):
            lo = cls_pad + f * patches
            return qkv[:, lo:lo + patches, off:off + head_dim]

        g_k = qkv[:, :1, off_k:off_k + head_dim]  # (BB, 1, D)
        g_v = qkv[:, :1, off_v:off_v + head_dim].astype(jnp.float32)
        ks = [rows(off_k, g) for g in range(frames)]
        vs = [rows(off_v, g) for g in range(frames)]
        for f in range(frames):
            q_f = rows(off_q, f).astype(jnp.float32) * scale
            logits = ([jnp.sum(q_f * g_k, axis=-1, keepdims=True)]
                      if with_cls else [])
            logits += [jnp.sum(q_f * ks[g], axis=-1, keepdims=True)
                       for g in range(frames)]
            peak = logits[0]
            for l in logits[1:]:
                peak = jnp.maximum(peak, l)
            exps = [jnp.exp(l - peak) for l in logits]
            denom = exps[0]
            for e in exps[1:]:
                denom = denom + e
            inv = out_mul / denom
            if with_cls:
                acc = (exps[0] * inv) * g_v
                frame_es = exps[1:]
            else:
                acc = (exps[0] * inv) * vs[0].astype(jnp.float32)
                frame_es = exps[1:]
                vs_rest = vs[1:]
            if with_cls:
                for g in range(frames):
                    acc = acc + (frame_es[g] * inv) * vs[g].astype(jnp.float32)
            else:
                for g in range(frames - 1):
                    acc = acc + (frame_es[g] * inv) \
                        * vs_rest[g].astype(jnp.float32)
            frame_outs[f].append(acc)
    return jnp.concatenate(
        [jnp.concatenate(parts, axis=2) for parts in frame_outs], axis=1)


def _cls_global_row_packed(qkv, heads: int, scale: float, out_mul,
                           key_mask=None, nq: int = 1):
    """_cls_global_row with the heads packed along the batch axis: one
    (H·BB, nq, N) logits dot + one AV dot instead of 12 per-head pairs.
    Same math (round-5 `clspack` variant)."""
    block_b, n, triple_w = qkv.shape
    width = triple_w // 3
    head_dim = width // heads
    scale_q = jnp.asarray(scale, qkv.dtype)

    def pack(lo, np_, offset):
        return jnp.concatenate(
            [qkv[:, lo:lo + np_,
                 offset + h * head_dim:offset + (h + 1) * head_dim]
             for h in range(heads)], axis=0)

    q = pack(0, nq, 0) * scale_q            # (HB, nq, D)
    k = pack(0, n, width)                   # (HB, N, D)
    v = pack(0, n, 2 * width)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (HB, nq, N)
    if key_mask is not None:
        logits = logits + key_mask
    peak = jnp.max(logits, axis=-1, keepdims=True)
    exps = jnp.exp(logits - peak)
    denom = jnp.sum(exps, axis=-1, keepdims=True)
    weights = (exps * (out_mul / denom)).astype(v.dtype)
    out = jax.lax.dot_general(
        weights, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (HB, nq, D)
    return jnp.concatenate(
        [out[h * block_b:(h + 1) * block_b] for h in range(heads)], axis=2)


def _space_attention_packed(qkv, heads: int, frames: int, patches: int,
                            scale: float, out_mul, cls_pad: int = 1,
                            col_mask=None, cls_concat: bool = False):
    """Divided SPACE attention with the heads PACKED along the batch axis —
    the formulation the CLIP megakernel proved fastest (ops/block.py): per
    frame, the 12 per-head (P, D) @ (D, P) dots become ONE batched
    (H·BB, P, P) dot_general, and the softmax/AV run once on the packed
    tensor. Same math as _space_attention (nocat CLS column join); the
    in-VMEM head pack/unpack concats replace 3x12 small matmul launches
    with 3 big ones per frame. Returns (BB, F*P, W) fp32 pre-scaled by
    out_mul."""
    block_b, n, triple_w = qkv.shape
    width = triple_w // 3
    head_dim = width // heads
    scale_q = jnp.asarray(scale, qkv.dtype)

    def pack(lo, np_, offset):
        return jnp.concatenate(
            [qkv[:, lo:lo + np_,
                 offset + h * head_dim:offset + (h + 1) * head_dim]
             for h in range(heads)], axis=0)  # (H*BB, np_, D)

    g_k = pack(0, 1, width)                   # (H*BB, 1, D)
    g_v = pack(0, 1, 2 * width).astype(jnp.float32)

    frame_parts = []
    for f in range(frames):
        lo = cls_pad + f * patches
        q = pack(lo, patches, 0) * scale_q    # (H*BB, P, D)
        k = pack(lo, patches, width)
        v = pack(lo, patches, 2 * width)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (HB, P, P)
        if col_mask is not None:
            logits = logits + col_mask
        cls_l = jax.lax.dot_general(
            q, g_k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (HB, P, 1)
        if cls_concat:
            cat = jnp.concatenate([cls_l, logits], axis=-1)
            peak = jnp.max(cat, axis=-1, keepdims=True)
            exps_cat = jnp.exp(cat - peak)
            denom = jnp.sum(exps_cat, axis=-1, keepdims=True)
            weights = (exps_cat * (out_mul / denom)).astype(v.dtype)
            out = jax.lax.dot_general(
                weights[:, :, 1:], v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # (HB, P, D)
            out = out + weights[:, :, :1].astype(jnp.float32) * g_v
        else:
            peak = jnp.maximum(jnp.max(logits, -1, keepdims=True), cls_l)
            exps = jnp.exp(logits - peak)
            cls_e = jnp.exp(cls_l - peak)
            inv = out_mul / (jnp.sum(exps, -1, keepdims=True) + cls_e)
            out = jax.lax.dot_general(
                (exps * inv).astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # (HB, P, D)
            out = out + (cls_e * inv) * g_v
        frame_parts.append(jnp.concatenate(
            [out[h * block_b:(h + 1) * block_b] for h in range(heads)],
            axis=2))                                        # (BB, P, W)
    return jnp.concatenate(frame_parts, axis=1)


def _time_attention_mxu(qkv, heads: int, frames: int, patches: int,
                        scale: float, out_mul, cls_pad: int = 1):
    """_time_attention re-expressed for the MXU: exactly the same math, but
    the per-(head, frame) lane reductions become full-width elementwise
    products + a (W, H) head-sum selection matmul, and the AV accumulation
    becomes a (H, W) head-expand matmul + FMA. The lane-reduction form costs
    ~6 VPU passes per 64-lane sum (Mosaic lowers trailing-axis reductions as
    shift/add chains) x 12 heads x 4 frames x 5 keys; this form does the
    reduction on the MXU where a 12-column matmul is effectively free.
    Returns (BB, F*P, W) fp32 pre-scaled by out_mul — numerically the
    reductions reassociate (matmul tree vs shift/add tree), parity-gated at
    the usual fp32 tolerances."""
    block_b, n, triple_w = qkv.shape
    width = triple_w // 3
    head_dim = width // heads

    # (W, H) head-sum selection: column h sums lanes [h*D, (h+1)*D).
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (width, heads), 0)
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (width, heads), 1)
    head_sum = (d_iota // head_dim == h_iota).astype(jnp.float32)
    head_expand = head_sum.T  # (H, W): broadcasts a per-head scalar to lanes

    def rows(off, f):
        lo = cls_pad + f * patches
        return qkv[:, lo:lo + patches, off:off + head_dim * heads]

    g_k = qkv[:, :1, width:2 * width].astype(jnp.float32)      # (BB, 1, W)
    g_v = qkv[:, :1, 2 * width:3 * width].astype(jnp.float32)
    ks = [rows(width, g).astype(jnp.float32) for g in range(frames)]
    vs = [rows(2 * width, g).astype(jnp.float32) for g in range(frames)]

    def head_logits(prod):
        return jax.lax.dot_general(
            prod, head_sum, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (BB, P, H)

    def expand(w_h):
        return jax.lax.dot_general(
            w_h, head_expand, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (BB, P, W)

    frame_parts = []
    for f in range(frames):
        q_f = rows(0, f).astype(jnp.float32) * scale           # (BB, P, W)
        logits = [head_logits(q_f * g_k)]
        logits += [head_logits(q_f * ks[g]) for g in range(frames)]
        peak = logits[0]
        for l in logits[1:]:
            peak = jnp.maximum(peak, l)
        exps = [jnp.exp(l - peak) for l in logits]
        denom = exps[0]
        for e in exps[1:]:
            denom = denom + e
        inv = out_mul / denom                                  # (BB, P, H)
        acc = expand(exps[0] * inv) * g_v
        for g in range(frames):
            acc = acc + expand(exps[g + 1] * inv) * vs[g]
        frame_parts.append(acc)
    return jnp.concatenate(frame_parts, axis=1)


def _int8_dense_nd(x_q, w_ref, scale_ref, bias_ref):
    """ops/block.py _int8_dense generalized to any leading shape: contracts
    the LAST axis of x_q against w (W, M)."""
    c = x_q.ndim - 1
    acc = jax.lax.dot_general(
        x_q, w_ref[...], dimension_numbers=(((c,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * scale_ref[...][0] + bias_ref[...][0]


def _cls_global_row_split(qkv_c, qkv_p, heads: int, scale: float, out_mul):
    """The CLS token's attention over [CLS | all F*P patch rows] in the
    SPLIT layout: qkv_c (BB, 1, 3W), qkv_p (BB, F, P, 3W). Returns
    (BB, 1, W) fp32 pre-scaled by out_mul. The (F, P) dims flatten to one
    N axis up front — Mosaic's matmul only takes single contracting dims,
    and collapsing the two sublane dims of a contiguous block is free."""
    bb, frames, n_patch, w3 = qkv_p.shape
    qkv_flat = qkv_p.reshape(bb, frames * n_patch, w3)
    width = w3 // 3
    head_dim = width // heads
    scale_q = jnp.asarray(scale, qkv_c.dtype)

    parts = []
    for h in range(heads):
        off_q, off_k, off_v = (h * head_dim, width + h * head_dim,
                               2 * width + h * head_dim)
        cq = qkv_c[:, :, off_q:off_q + head_dim] * scale_q     # (BB, 1, D)
        kc = qkv_c[:, :, off_k:off_k + head_dim]
        vc = qkv_c[:, :, off_v:off_v + head_dim].astype(jnp.float32)
        kp = qkv_flat[:, :, off_k:off_k + head_dim]            # (BB, N, D)
        vp = qkv_flat[:, :, off_v:off_v + head_dim]
        self_l = jnp.sum(cq.astype(jnp.float32)
                         * kc.astype(jnp.float32), -1, keepdims=True)
        logits = jax.lax.dot_general(
            cq, kp, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # (BB, 1, N)
        peak = jnp.maximum(jnp.max(logits, -1, keepdims=True), self_l)
        exps = jnp.exp(logits - peak)
        self_e = jnp.exp(self_l - peak)                        # (BB, 1, 1)
        denom = jnp.sum(exps, -1, keepdims=True) + self_e
        weights = (exps * (out_mul / denom)).astype(vp.dtype)
        out = jax.lax.dot_general(
            weights, vp, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # (BB, 1, D)
        out = out + (self_e * (out_mul / denom)) * vc
        parts.append(out)
    return jnp.concatenate(parts, axis=2)


def _space_attention_split(qkv_c, qkv_p, heads: int, scale: float, out_mul):
    """Divided SPACE attention in the SPLIT layout: per frame the patch rows
    attend within the frame plus the clip's global CLS key/value. Frame
    access is leading-dim indexing of qkv_p (BB, F, P, 3W) — no unaligned
    row slices. Returns (BB, F, P, W) fp32 pre-scaled by out_mul."""
    frames = qkv_p.shape[1]
    width = qkv_c.shape[-1] // 3
    head_dim = width // heads
    scale_q = jnp.asarray(scale, qkv_p.dtype)

    frame_parts = []
    for f in range(frames):
        head_parts = []
        for h in range(heads):
            off_q, off_k, off_v = (h * head_dim, width + h * head_dim,
                                   2 * width + h * head_dim)
            q = qkv_p[:, f, :, off_q:off_q + head_dim] * scale_q
            k = qkv_p[:, f, :, off_k:off_k + head_dim]
            v = qkv_p[:, f, :, off_v:off_v + head_dim]
            g_k = qkv_c[:, :, off_k:off_k + head_dim]          # (BB, 1, D)
            g_v = qkv_c[:, :, off_v:off_v + head_dim]
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # (BB, P, P)
            cls_l = jax.lax.dot_general(
                q, g_k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # (BB, P, 1)
            peak = jnp.maximum(jnp.max(logits, -1, keepdims=True), cls_l)
            exps = jnp.exp(logits - peak)
            cls_e = jnp.exp(cls_l - peak)
            denom = jnp.sum(exps, -1, keepdims=True) + cls_e
            inv = out_mul / denom
            out = jax.lax.dot_general(
                (exps * inv).astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # (BB, P, D)
            out = out + (cls_e * inv) * g_v.astype(jnp.float32)
            head_parts.append(out)
        frame_parts.append(jnp.concatenate(head_parts, axis=2)[:, None])
    return jnp.concatenate(frame_parts, axis=1)


def _time_attention_split(qkv_c, qkv_p, heads: int, scale: float, out_mul):
    """Divided TIME attention in the SPLIT layout (same unrolled
    max/exp/sum softmax over F+1 values as _time_attention); frame rows are
    leading-dim indexed. Returns (BB, F, P, W) fp32 pre-scaled by out_mul."""
    frames = qkv_p.shape[1]
    width = qkv_c.shape[-1] // 3
    head_dim = width // heads

    frame_outs = [[] for _ in range(frames)]  # [f][head] -> (BB, P, D)
    for h in range(heads):
        off_q, off_k, off_v = (h * head_dim, width + h * head_dim,
                               2 * width + h * head_dim)
        g_k = qkv_c[:, :, off_k:off_k + head_dim]              # (BB, 1, D)
        g_v = qkv_c[:, :, off_v:off_v + head_dim].astype(jnp.float32)
        ks = [qkv_p[:, g, :, off_k:off_k + head_dim] for g in range(frames)]
        vs = [qkv_p[:, g, :, off_v:off_v + head_dim] for g in range(frames)]
        for f in range(frames):
            q_f = qkv_p[:, f, :, off_q:off_q + head_dim] \
                .astype(jnp.float32) * scale
            logits = [jnp.sum(q_f * g_k, axis=-1, keepdims=True)]
            logits += [jnp.sum(q_f * ks[g], axis=-1, keepdims=True)
                       for g in range(frames)]
            peak = logits[0]
            for l in logits[1:]:
                peak = jnp.maximum(peak, l)
            exps = [jnp.exp(l - peak) for l in logits]
            denom = exps[0]
            for e in exps[1:]:
                denom = denom + e
            inv = out_mul / denom
            acc = (exps[0] * inv) * g_v
            for g in range(frames):
                acc = acc + (exps[g + 1] * inv) * vs[g].astype(jnp.float32)
            frame_outs[f].append(acc)
    return jnp.concatenate(
        [jnp.concatenate(parts, axis=2)[:, None] for parts in frame_outs],
        axis=1)


def _erf_gelu_quant(t, kv_row, approx_recip: bool):
    """Folded exact-GELU epilogue shared by both kernel layouts: t is the
    already-inv_p-scaled fc1 output, kv_row the folded erf argument scale.
    Returns the int8-quantized hidden activations."""
    z = t * kv_row
    az = jnp.abs(z)
    u = (pl.reciprocal(1.0 + 0.3275911 * az, approx=True) if approx_recip
         else 1.0 / (1.0 + 0.3275911 * az))
    poly = u * (0.254829592 + u * (-0.284496736 + u * (
        1.421413741 + u * (-1.453152027 + u * 1.061405429))))
    pe = poly * jnp.exp2((-LOG2E) * az * az)
    erf = jnp.where(z < 0.0, pe - 1.0, 1.0 - pe)
    g = 0.5 * t * (1.0 + erf)
    return jnp.clip(jnp.round(g), -127, 127).astype(jnp.int8)


def _fit_layer_split_kernel(cls_ref, xp_ref, invs_ref,
                            ln3_s_ref, ln3_b_ref, wtq_ref, tqs_ref, tqb_ref,
                            wtp_ref, tps_ref, tpb_ref,
                            ln1_s_ref, ln1_b_ref, wsq_ref, sqs_ref, sqb_ref,
                            wsp_ref, sps_ref, spb_ref,
                            ln2_s_ref, ln2_b_ref, wf_ref, fs2_ref, fb2_ref,
                            kv_ref, wp_ref, ps_ref, pb_ref,
                            yc_ref, yp_ref, *,
                            heads: int, approx_recip: bool = True,
                            ln_eps: float = FIT_LN_EPS):
    """The whole-SpaceTimeBlock kernel in the SPLIT layout: CLS (BB, 1, W)
    and patch rows (BB, F, P, W) as separate operands/outputs. Same math as
    _fit_layer_kernel; the layout turns every per-frame access into aligned
    leading-dim indexing (the joint (BB, 1+F*P, W) layout slices rows at
    offsets ≡ 1 mod 8, which Mosaic implements as sublane shifts — measured
    ~2x the kernel's dense floor at eval shape)."""
    xc32 = cls_ref[...].astype(jnp.float32)
    xp32 = xp_ref[...].astype(jnp.float32)
    width = xp32.shape[-1]
    head_dim = width // heads
    scale = head_dim ** -0.5
    dtype = cls_ref.dtype

    def attention_half(hc32, hp32, inv_in, wq_ref, qs_ref, qb_ref, inv_out,
                       wo_ref, os_ref, ob_ref, mode):
        qkv_c = _int8_dense_nd(_quant(hc32, inv_in),
                               wq_ref, qs_ref, qb_ref).astype(dtype)
        qkv_p = _int8_dense_nd(_quant(hp32, inv_in),
                               wq_ref, qs_ref, qb_ref).astype(dtype)
        cls_out = _cls_global_row_split(qkv_c, qkv_p, heads, scale, inv_out)
        if mode == "space":
            rows = _space_attention_split(qkv_c, qkv_p, heads, scale, inv_out)
        else:
            rows = _time_attention_split(qkv_c, qkv_p, heads, scale, inv_out)
        c_q = jnp.clip(jnp.round(cls_out), -127, 127).astype(jnp.int8)
        p_q = jnp.clip(jnp.round(rows), -127, 127).astype(jnp.int8)
        return (_int8_dense_nd(c_q, wo_ref, os_ref, ob_ref),
                _int8_dense_nd(p_q, wo_ref, os_ref, ob_ref))

    # --- time half: t = x + proj(timeattn(LN3(x))) ---
    tc, tp = attention_half(
        _ln(xc32, ln3_s_ref, ln3_b_ref, ln_eps),
        _ln(xp32, ln3_s_ref, ln3_b_ref, ln_eps), invs_ref[0, 0],
        wtq_ref, tqs_ref, tqb_ref, invs_ref[0, 1],
        wtp_ref, tps_ref, tpb_ref, "time")
    tc32, tp32 = xc32 + tc, xp32 + tp

    # --- space half: s = x + proj(attn(LN1(t))) — residual from the ORIGINAL
    # input (the frozen-in-time topology, video_transformer.py:232) ---
    sc, sp = attention_half(
        _ln(tc32, ln1_s_ref, ln1_b_ref, ln_eps),
        _ln(tp32, ln1_s_ref, ln1_b_ref, ln_eps), invs_ref[0, 2],
        wsq_ref, sqs_ref, sqb_ref, invs_ref[0, 3],
        wsp_ref, sps_ref, spb_ref, "space")
    sc32, sp32 = xc32 + sc, xp32 + sp

    # --- MLP half: folded exact-GELU epilogue (see _fit_layer_kernel) ---
    for s32, y_ref in ((sc32, yc_ref), (sp32, yp_ref)):
        h2_q = _quant(_ln(s32, ln2_s_ref, ln2_b_ref, ln_eps), invs_ref[0, 4])
        acc = jax.lax.dot_general(
            h2_q, wf_ref[...],
            dimension_numbers=(((h2_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        t = acc.astype(jnp.float32) * fs2_ref[...][0] + fb2_ref[...][0]
        h_q = _erf_gelu_quant(t, kv_ref[...][0], approx_recip)
        y_ref[...] = (s32 + _int8_dense_nd(h_q, wp_ref, ps_ref, pb_ref)) \
            .astype(y_ref.dtype)


def _joint_attention(qkv, heads: int, scale: float, out_mul):
    """SINGLE-softmax attention over the full (BB, N, 3W) sequence — the
    undivided formulation a plain ViT would use at clip level, as the
    `joint1sm` attribution arm (VERDICT r4 #1 arm d). Per-head lane-slice
    form like _space_attention but one (N, N) softmax instead of the divided
    time/space pair. Returns (BB, N, W) fp32 pre-scaled by out_mul."""
    block_b, n, triple_w = qkv.shape
    width = triple_w // 3
    head_dim = width // heads
    scale_q = jnp.asarray(scale, qkv.dtype)

    parts = []
    for h in range(heads):
        off_q, off_k, off_v = (h * head_dim, width + h * head_dim,
                               2 * width + h * head_dim)
        q = qkv[:, :, off_q:off_q + head_dim] * scale_q
        k = qkv[:, :, off_k:off_k + head_dim]
        v = qkv[:, :, off_v:off_v + head_dim]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (BB, N, N)
        peak = jnp.max(logits, axis=-1, keepdims=True)
        exps = jnp.exp(logits - peak)
        denom = jnp.sum(exps, axis=-1, keepdims=True)
        weights = (exps * (out_mul / denom)).astype(v.dtype)
        parts.append(jax.lax.dot_general(
            weights, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))             # (BB, N, D)
    return jnp.concatenate(parts, axis=2)


def _fit_layer_kernel(x_ref, invs_ref,
                      ln3_s_ref, ln3_b_ref, wtq_ref, tqs_ref, tqb_ref,
                      wtp_ref, tps_ref, tpb_ref,
                      ln1_s_ref, ln1_b_ref, wsq_ref, sqs_ref, sqb_ref,
                      wsp_ref, sps_ref, spb_ref,
                      ln2_s_ref, ln2_b_ref, wf_ref, fs2_ref, fb2_ref, kv_ref,
                      wp_ref, ps_ref, pb_ref, y_ref, *,
                      heads: int, frames: int,
                      approx_recip: bool = True, ln_eps: float = FIT_LN_EPS,
                      variant: str = "full"):
    """variant selects a TIMING-ONLY attribution arm (VERDICT r4 #1); all
    arms keep the exact dense/LN/quant dataflow of `full` so the Mosaic
    schedule changes are confined to the ablated attention core (the
    round-3 standalone ablations failed because slicing rows out rewired
    the whole body — these passthroughs keep every operand shape):
      full        — the shipped kernel
      notime_core — time-attention mixing -> q passthrough (denses stay)
      nospace_core— space-attention mixing -> q passthrough (denses stay)
      noattn_core — both mixings -> passthrough (LN+denses+quant+MLP only)
      nocls       — both attentions WITHOUT the global-CLS key/value path
      joint1sm    — no time half at all; space half = one undivided (N, N)
                    softmax per head (the plain-ViT formulation)
    Numerics of the timing-only arms above are junk by construction — they
    are for interleaved e2e timing, never for accuracy. PARITY-EXACT
    variants (same math, different compute path; composable with "+"):
      timemxu     — time attention via head-sum/expand selection matmuls
      clscat      — the pre-round-5 lane-concat CLS join in space attention
      spacepack   — space attention with heads packed along the batch axis
                    (one QK^T/AV matmul per frame for all heads — the CLIP
                    kernel's proven form) instead of 12 per-head dots"""
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    n, width = x.shape[-2], x.shape[-1]
    patches = (n - 1) // frames
    head_dim = width // heads
    scale = head_dim ** -0.5
    tokens = variant.split("+")

    def attention_half(h32, inv_in, wq_ref, qs_ref, qb_ref, inv_out,
                       wo_ref, os_ref, ob_ref, mode):
        h_q = _quant(h32, inv_in)
        qkv = _int8_dense(h_q, wq_ref, qs_ref, qb_ref).astype(x.dtype)
        skip_core = ("noattn_core" in tokens
                     or ("notime_core" in tokens and mode == "time")
                     or ("nospace_core" in tokens and mode == "space"))
        if skip_core:
            att = qkv[:, :, :width].astype(jnp.float32) * inv_out
        elif mode == "joint":
            att = _joint_attention(qkv, heads, scale, inv_out)
        else:
            with_cls = "nocls" not in tokens
            if not with_cls:
                cls_out = qkv[:, :1, :width].astype(jnp.float32) * inv_out
            elif "clspack" in tokens:
                cls_out = _cls_global_row_packed(qkv, heads, scale, inv_out)
            else:
                cls_out = _cls_global_row(qkv, heads, scale, inv_out)
            if mode == "space" and "spacepack" in tokens:
                rows = _space_attention_packed(
                    qkv, heads, frames, patches, scale, inv_out,
                    cls_concat="spacecat" in tokens)
            elif mode == "space":
                rows = _space_attention(qkv, heads, frames, patches, scale,
                                        inv_out, with_cls=with_cls,
                                        cls_concat="clscat" in tokens)
            elif "timemxu" in tokens:
                rows = _time_attention_mxu(qkv, heads, frames, patches, scale,
                                           inv_out)
            else:
                rows = _time_attention(qkv, heads, frames, patches, scale,
                                       inv_out, with_cls=with_cls)
            att = jnp.concatenate([cls_out, rows], axis=1)
        att_q = jnp.clip(jnp.round(att), -127, 127).astype(jnp.int8)
        return _int8_dense(att_q, wo_ref, os_ref, ob_ref)

    # --- time half: t = x + proj(timeattn(LN3(x))) ---
    if "joint1sm" in tokens:
        t32 = x32
    else:
        t32 = x32 + attention_half(
            _ln(x32, ln3_s_ref, ln3_b_ref, ln_eps), invs_ref[0, 0],
            wtq_ref, tqs_ref, tqb_ref, invs_ref[0, 1],
            wtp_ref, tps_ref, tpb_ref, "time")

    # --- space half: s = x + proj(attn(LN1(t))) — residual from the ORIGINAL
    # input (the frozen-in-time topology, video_transformer.py:232) ---
    s32 = x32 + attention_half(
        _ln(t32, ln1_s_ref, ln1_b_ref, ln_eps), invs_ref[0, 2],
        wsq_ref, sqs_ref, sqb_ref, invs_ref[0, 3],
        wsp_ref, sps_ref, spb_ref,
        "joint" if "joint1sm" in tokens else "space")

    # --- MLP half: folded exact-GELU epilogue (ops/block.py quick_gelu=False
    # branch): t = gelu-input * inv_p from the int32 accumulator, erf arg
    # z = t * kv with kv = 1/(sqrt(2) * inv_p) folded outside. ---
    h2_q = _quant(_ln(s32, ln2_s_ref, ln2_b_ref, ln_eps), invs_ref[0, 4])
    acc = jax.lax.dot_general(
        h2_q, wf_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    t = acc.astype(jnp.float32) * fs2_ref[...][0] + fb2_ref[...][0]
    z = t * kv_ref[...][0]
    az = jnp.abs(z)
    u = (pl.reciprocal(1.0 + 0.3275911 * az, approx=True) if approx_recip
         else 1.0 / (1.0 + 0.3275911 * az))
    poly = u * (0.254829592 + u * (-0.284496736 + u * (
        1.421413741 + u * (-1.453152027 + u * 1.061405429))))
    pe = poly * jnp.exp2((-LOG2E) * az * az)
    erf = jnp.where(z < 0.0, pe - 1.0, 1.0 - pe)
    g = 0.5 * t * (1.0 + erf)
    h_q = jnp.clip(jnp.round(g), -127, 127).astype(jnp.int8)
    y_ref[...] = (s32 + _int8_dense(h_q, wp_ref, ps_ref, pb_ref)) \
        .astype(y_ref.dtype)


def _fit_layer_pad_kernel(x_ref, invs_ref, cmask_ref, smask_ref,
                          ln3_s_ref, ln3_b_ref, wtq_ref, tqs_ref, tqb_ref,
                          wtp_ref, tps_ref, tpb_ref,
                          ln1_s_ref, ln1_b_ref, wsq_ref, sqs_ref, sqb_ref,
                          wsp_ref, sps_ref, spb_ref,
                          ln2_s_ref, ln2_b_ref, wf_ref, fs2_ref, fb2_ref,
                          kv_ref, wp_ref, ps_ref, pb_ref, y_ref, *,
                          heads: int, frames: int, cls_pad: int,
                          approx_recip: bool = True,
                          ln_eps: float = FIT_LN_EPS,
                          variant: str = "full"):
    """_fit_layer_kernel on the PAD8 joint layout: rows are
    [CLS | cls_pad-1 dead | F groups of P rows], with P a multiple of 8 so
    every in-kernel frame slice starts on a sublane boundary (the 1+F*196
    layout's ≡1 mod 8 offsets lower as Mosaic sublane shifts). Dead rows
    (group tails + the CLS block tail) are finite junk: excluded from real
    rows' softmaxes by cmask (1, N) / smask (1, P) 0/-inf operands, and
    row-local everywhere else."""
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    n, width = x.shape[-2], x.shape[-1]
    patches = (n - cls_pad) // frames
    head_dim = width // heads
    scale = head_dim ** -0.5
    cmask = cmask_ref[...].reshape(1, cls_pad, n)
    # Full-tile (P, P) mask: a (1, 1, P) operand broadcast over P sublanes
    # crashed Mosaic's layout check ("limits 25 vs dim 1") — ship the
    # materialized rows instead.
    smask = smask_ref[...].reshape(1, patches, patches)

    def attention_half(h32, inv_in, wq_ref, qs_ref, qb_ref, inv_out,
                       wo_ref, os_ref, ob_ref, mode):
        h_q = _quant(h32, inv_in)
        qkv = _int8_dense(h_q, wq_ref, qs_ref, qb_ref).astype(x.dtype)
        tokens = variant.split("+")
        # The whole aligned CLS block rides the global-attention path (row 0
        # real, rows 1..cls_pad-1 dead junk) — see _cls_global_row nq.
        cls_fn = (_cls_global_row_packed if "clspack" in tokens
                  else _cls_global_row)
        cls_out = cls_fn(qkv, heads, scale, inv_out, key_mask=cmask,
                         nq=cls_pad)
        if mode == "space" and "spacepack" in tokens:
            rows = _space_attention_packed(qkv, heads, frames, patches,
                                           scale, inv_out, cls_pad=cls_pad,
                                           col_mask=smask,
                                           cls_concat="spacecat" in tokens)
        elif mode == "space":
            rows = _space_attention(qkv, heads, frames, patches, scale,
                                    inv_out, cls_pad=cls_pad, col_mask=smask,
                                    cls_concat="clscat" in tokens)
        elif "timemxu" in tokens:
            # Time attention is position-local, so the pad8 dead rows only
            # ever attend to (and produce) junk at dead positions — no mask
            # needed, exactly as the lane-reduction form.
            rows = _time_attention_mxu(qkv, heads, frames, patches, scale,
                                       inv_out, cls_pad=cls_pad)
        else:
            rows = _time_attention(qkv, heads, frames, patches, scale,
                                   inv_out, cls_pad=cls_pad)
        att = jnp.concatenate([cls_out, rows], axis=1)
        att_q = jnp.clip(jnp.round(att), -127, 127).astype(jnp.int8)
        return _int8_dense(att_q, wo_ref, os_ref, ob_ref)

    t32 = x32 + attention_half(
        _ln(x32, ln3_s_ref, ln3_b_ref, ln_eps), invs_ref[0, 0],
        wtq_ref, tqs_ref, tqb_ref, invs_ref[0, 1],
        wtp_ref, tps_ref, tpb_ref, "time")
    s32 = x32 + attention_half(
        _ln(t32, ln1_s_ref, ln1_b_ref, ln_eps), invs_ref[0, 2],
        wsq_ref, sqs_ref, sqb_ref, invs_ref[0, 3],
        wsp_ref, sps_ref, spb_ref, "space")
    h2_q = _quant(_ln(s32, ln2_s_ref, ln2_b_ref, ln_eps), invs_ref[0, 4])
    acc = jax.lax.dot_general(
        h2_q, wf_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    t = acc.astype(jnp.float32) * fs2_ref[...][0] + fb2_ref[...][0]
    h_q = _erf_gelu_quant(t, kv_ref[...][0], approx_recip)
    y_ref[...] = (s32 + _int8_dense(h_q, wp_ref, ps_ref, pb_ref)) \
        .astype(y_ref.dtype)


def pad8_masks(frames: int, real_patches: int, group: int, cls_pad: int):
    """(cmask (1, N), smask (1, group)) fp32 0/-inf numpy masks for the
    pad8 layout: valid rows are row 0 and the first real_patches of each
    frame group."""
    import numpy as np

    # Large-but-finite: exp(masked - peak) underflows to exactly 0 without
    # risking inf arithmetic in the peak subtraction.
    neg = np.float32(-1e30)
    n = cls_pad + frames * group
    # cmask rows are identical, materialized at (cls_pad, n) so the kernel
    # never broadcasts along sublanes (Mosaic layout-check crash).
    row = np.full((n,), neg, np.float32)
    row[0] = 0.0
    for f in range(frames):
        lo = cls_pad + f * group
        row[lo:lo + real_patches] = 0.0
    cmask = np.broadcast_to(row, (cls_pad, n)).copy()
    smask = np.full((group, group), neg, np.float32)
    smask[:, :real_patches] = 0.0
    return cmask, smask


def fused_fit_int8_layer_pad(x: jnp.ndarray, layer: Dict[str, Any],
                             heads: int, frames: int, real_patches: int,
                             cls_pad: int = 8, block_rows: int = 1,
                             ln_eps: float = FIT_LN_EPS,
                             interpret: Optional[bool] = None,
                             variant: str = "full") -> jnp.ndarray:
    """fused_fit_int8_layer on the pad8 layout: x is
    (B, cls_pad + F*group, W) with group % 8 == 0 (build it with
    models/frozen_in_time/fit_fast.py's pad8 path); real_patches counts the
    valid rows per frame group, the rest are masked dead rows."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch, seq, width = x.shape
    group = (seq - cls_pad) // frames
    cmask, smask = pad8_masks(frames, real_patches, group, cls_pad)

    invs, weights = _layer_weight_operands(layer)
    operands = [x, invs, jnp.asarray(cmask), jnp.asarray(smask)] + weights
    kernel = functools.partial(_fit_layer_pad_kernel, heads=heads,
                               frames=frames, cls_pad=cls_pad,
                               approx_recip=not interpret, ln_eps=ln_eps,
                               variant=variant)

    block = block_rows
    while batch % block:
        block -= 1
    memory_space = pltpu.ANY if interpret else pltpu.VMEM
    smem = pltpu.ANY if interpret else pltpu.SMEM
    in_specs = [pl.BlockSpec((block, seq, width), lambda i: (i, 0, 0),
                             memory_space=memory_space)]
    for idx, op in enumerate(operands[1:], start=1):
        in_specs.append(pl.BlockSpec(
            op.shape, lambda i, nd=op.ndim: (0,) * nd,
            memory_space=smem if idx == 1 else memory_space))
    return pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, seq, width), lambda i: (i, 0, 0),
                               memory_space=memory_space),
        out_shape=jax.ShapeDtypeStruct((batch, seq, width), x.dtype),
        interpret=interpret,
        input_output_aliases={0: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(*operands)


def _dense_operands(node: Dict[str, Any]):
    """Quantized dense node -> (kernel_q, folded out scale (1, n), bias
    (1, n), act inv scalar). Same math as ops/block.py."""
    act = jnp.maximum(node["act_scale"].astype(jnp.float32).reshape(()),
                      QUANT_EPS)
    out_scale = (act / 127.0) * node["scale"].astype(jnp.float32)
    return (node["kernel_q"], out_scale.reshape(1, -1),
            node["bias"].astype(jnp.float32).reshape(1, -1), 127.0 / act)


def _layer_weight_operands(layer: Dict[str, Any]):
    """The (invs, [weight operands...]) shared by both kernel layouts, in
    _fit_layer_kernel's operand order (minus the activations)."""
    wtq, tqs, tqb, inv_tq = _dense_operands(layer["timeattn"]["qkv"])
    wtp, tps, tpb, inv_tp = _dense_operands(layer["timeattn"]["proj"])
    wsq, sqs, sqb, inv_sq = _dense_operands(layer["attn"]["qkv"])
    wsp, sps, spb, inv_sp = _dense_operands(layer["attn"]["proj"])
    wf, fs, fb, inv_f = _dense_operands(layer["mlp_fc1"])
    wp, ps, pb, inv_p = _dense_operands(layer["mlp_fc2"])
    invs = jnp.stack([inv_tq, inv_tp, inv_sq, inv_sp, inv_f, inv_p]) \
        .reshape(1, 6)

    fs2 = fs * inv_p
    fb2 = fb * inv_p
    kv = jnp.full(fs.shape, 1.0, jnp.float32) * (0.7071067811865475 / inv_p)

    def ln_vec(name, leaf):
        return layer[name][leaf].astype(jnp.float32).reshape(1, -1)

    return invs, [
        ln_vec("norm3", "weight"), ln_vec("norm3", "bias"), wtq, tqs, tqb,
        wtp, tps, tpb,
        ln_vec("norm1", "weight"), ln_vec("norm1", "bias"), wsq, sqs, sqb,
        wsp, sps, spb,
        ln_vec("norm2", "weight"), ln_vec("norm2", "bias"), wf, fs2, fb2, kv,
        wp, ps, pb,
    ]


def fused_fit_int8_layer_split(cls_row: jnp.ndarray, patches: jnp.ndarray,
                               layer: Dict[str, Any], heads: int,
                               block_rows: int = 1,
                               ln_eps: float = FIT_LN_EPS,
                               interpret: Optional[bool] = None):
    """SPLIT-layout whole-block kernel: cls_row (B, 1, W) + patches
    (B, F, P, W) bf16 -> same shapes. Numerically the same math as
    fused_fit_int8_layer on the joint (B, 1+F*P, W) layout, but every frame
    access in-kernel is aligned leading-dim indexing. Both activation
    operands are ALIASED to the outputs (callers must treat them as
    donated); weights are VMEM-resident across the batch grid."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    invs, weights = _layer_weight_operands(layer)
    operands = [cls_row, patches, invs] + weights
    kernel = functools.partial(_fit_layer_split_kernel, heads=heads,
                               approx_recip=not interpret, ln_eps=ln_eps)

    batch, _, width = cls_row.shape
    frames, n_patch = patches.shape[1], patches.shape[2]
    block = block_rows
    while batch % block:
        block -= 1
    memory_space = pltpu.ANY if interpret else pltpu.VMEM
    smem = pltpu.ANY if interpret else pltpu.SMEM
    in_specs = [
        pl.BlockSpec((block, 1, width), lambda i: (i, 0, 0),
                     memory_space=memory_space),
        pl.BlockSpec((block, frames, n_patch, width),
                     lambda i: (i, 0, 0, 0), memory_space=memory_space),
    ]
    for idx, op in enumerate(operands[2:], start=2):
        in_specs.append(pl.BlockSpec(
            op.shape, lambda i, nd=op.ndim: (0,) * nd,
            memory_space=smem if idx == 2 else memory_space))
    return pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block, 1, width), lambda i: (i, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((block, frames, n_patch, width),
                         lambda i: (i, 0, 0, 0), memory_space=memory_space),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(cls_row.shape, cls_row.dtype),
            jax.ShapeDtypeStruct(patches.shape, patches.dtype),
        ],
        interpret=interpret,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(*operands)


def fused_fit_int8_layer(x: jnp.ndarray, layer: Dict[str, Any], heads: int,
                         frames: int, block_rows: int = 1,
                         ln_eps: float = FIT_LN_EPS,
                         interpret: Optional[bool] = None,
                         variant: str = "full") -> jnp.ndarray:
    """x (B, 1+F*P, W) bf16 + one SpaceTimeBlock's quantized param node
    (norm1/norm2/norm3 with weight/bias; attn.qkv/attn.proj, timeattn.qkv/
    timeattn.proj, mlp_fc1, mlp_fc2 as {kernel_q, scale, bias, act_scale})
    -> (B, 1+F*P, W) bf16. The activation operand is ALIASED to the output
    (callers must treat it as donated); weights are VMEM-resident across the
    batch grid via constant index maps. variant != "full" selects a
    timing-only attribution arm (see _fit_layer_kernel)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    invs, weights = _layer_weight_operands(layer)
    operands = [x, invs] + weights
    kernel = functools.partial(_fit_layer_kernel, heads=heads, frames=frames,
                               approx_recip=not interpret, ln_eps=ln_eps,
                               variant=variant)

    batch, seq, width = x.shape
    block = block_rows
    while batch % block:
        block -= 1
    memory_space = pltpu.ANY if interpret else pltpu.VMEM
    smem = pltpu.ANY if interpret else pltpu.SMEM
    in_specs = [pl.BlockSpec((block, seq, width), lambda i: (i, 0, 0),
                             memory_space=memory_space)]
    for idx, op in enumerate(operands[1:], start=1):
        in_specs.append(pl.BlockSpec(
            op.shape, lambda i, nd=op.ndim: (0,) * nd,
            memory_space=smem if idx == 1 else memory_space))
    return pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, seq, width), lambda i: (i, 0, 0),
                               memory_space=memory_space),
        out_shape=jax.ShapeDtypeStruct((batch, seq, width), x.dtype),
        interpret=interpret,
        input_output_aliases={0: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(*operands)
