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


def _cls_global_row(qkv, heads: int, scale: float, out_mul):
    """The CLS token's attention over the FULL (BB, N, 3W) qkv: one query
    row per head, softmax over all N keys; the requant multiplier rides the
    normalizer. Returns (BB, 1, W) fp32 (pre-scaled by out_mul)."""
    block_b, n, triple_w = qkv.shape
    width = triple_w // 3
    head_dim = width // heads
    scale_q = jnp.asarray(scale, qkv.dtype)

    parts = []
    for h in range(heads):
        cq = qkv[:, :1, h * head_dim:(h + 1) * head_dim] * scale_q
        kh = qkv[:, :, width + h * head_dim:width + (h + 1) * head_dim]
        vh = qkv[:, :, 2 * width + h * head_dim:2 * width + (h + 1) * head_dim]
        logits = jax.lax.dot_general(
            cq, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (BB, 1, N)
        peak = jnp.max(logits, axis=-1, keepdims=True)
        exps = jnp.exp(logits - peak)
        denom = jnp.sum(exps, axis=-1, keepdims=True)
        weights = (exps * (out_mul / denom)).astype(vh.dtype)
        parts.append(jax.lax.dot_general(
            weights, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))  # (BB, 1, D)
    return jnp.concatenate(parts, axis=2)


def _space_attention(qkv, heads: int, frames: int, patches: int,
                     scale: float, out_mul):
    """Divided SPACE attention on in-VMEM qkv (BB, 1+F*P, 3W): per frame the
    patch rows attend within the frame plus the clip's global CLS key/value
    (joined in logit space as index 0). Per-(frame, head) lane-slice form.
    Returns (BB, F*P, W) fp32 pre-scaled by out_mul (patch rows only)."""
    block_b, n, triple_w = qkv.shape
    width = triple_w // 3
    head_dim = width // heads
    scale_q = jnp.asarray(scale, qkv.dtype)

    frame_parts = []
    for f in range(frames):
        lo = 1 + f * patches
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
            cls_l = jax.lax.dot_general(
                q, g_k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (BB, P, 1)
            logits = jnp.concatenate([cls_l, logits], axis=-1)
            peak = jnp.max(logits, axis=-1, keepdims=True)
            exps = jnp.exp(logits - peak)
            denom = jnp.sum(exps, axis=-1, keepdims=True)
            weights = (exps * (out_mul / denom)).astype(v.dtype)
            out = jax.lax.dot_general(
                weights[:, :, 1:], v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (BB, P, D)
            out = out + weights[:, :, :1].astype(jnp.float32) * \
                g_v.astype(jnp.float32)
            head_parts.append(out)
        frame_parts.append(jnp.concatenate(head_parts, axis=2))
    return jnp.concatenate(frame_parts, axis=1)


def _time_attention(qkv, heads: int, frames: int, patches: int,
                    scale: float, out_mul):
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
            lo = 1 + f * patches
            return qkv[:, lo:lo + patches, off:off + head_dim]

        g_k = qkv[:, :1, off_k:off_k + head_dim]  # (BB, 1, D)
        g_v = qkv[:, :1, off_v:off_v + head_dim].astype(jnp.float32)
        ks = [rows(off_k, g) for g in range(frames)]
        vs = [rows(off_v, g) for g in range(frames)]
        for f in range(frames):
            q_f = rows(off_q, f).astype(jnp.float32) * scale
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
        [jnp.concatenate(parts, axis=2) for parts in frame_outs], axis=1)


def _fit_layer_kernel(x_ref, invs_ref,
                      ln3_s_ref, ln3_b_ref, wtq_ref, tqs_ref, tqb_ref,
                      wtp_ref, tps_ref, tpb_ref,
                      ln1_s_ref, ln1_b_ref, wsq_ref, sqs_ref, sqb_ref,
                      wsp_ref, sps_ref, spb_ref,
                      ln2_s_ref, ln2_b_ref, wf_ref, fs2_ref, fb2_ref, kv_ref,
                      wp_ref, ps_ref, pb_ref, y_ref, *,
                      heads: int, frames: int,
                      approx_recip: bool = True, ln_eps: float = FIT_LN_EPS):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    n, width = x.shape[-2], x.shape[-1]
    patches = (n - 1) // frames
    head_dim = width // heads
    scale = head_dim ** -0.5

    def attention_half(h32, inv_in, wq_ref, qs_ref, qb_ref, inv_out,
                       wo_ref, os_ref, ob_ref, mode):
        h_q = _quant(h32, inv_in)
        qkv = _int8_dense(h_q, wq_ref, qs_ref, qb_ref).astype(x.dtype)
        cls_out = _cls_global_row(qkv, heads, scale, inv_out)
        if mode == "space":
            rows = _space_attention(qkv, heads, frames, patches, scale, inv_out)
        else:
            rows = _time_attention(qkv, heads, frames, patches, scale, inv_out)
        att = jnp.concatenate([cls_out, rows], axis=1)
        att_q = jnp.clip(jnp.round(att), -127, 127).astype(jnp.int8)
        return _int8_dense(att_q, wo_ref, os_ref, ob_ref)

    # --- time half: t = x + proj(timeattn(LN3(x))) ---
    t32 = x32 + attention_half(
        _ln(x32, ln3_s_ref, ln3_b_ref, ln_eps), invs_ref[0, 0],
        wtq_ref, tqs_ref, tqb_ref, invs_ref[0, 1],
        wtp_ref, tps_ref, tpb_ref, "time")

    # --- space half: s = x + proj(attn(LN1(t))) — residual from the ORIGINAL
    # input (the frozen-in-time topology, video_transformer.py:232) ---
    s32 = x32 + attention_half(
        _ln(t32, ln1_s_ref, ln1_b_ref, ln_eps), invs_ref[0, 2],
        wsq_ref, sqs_ref, sqb_ref, invs_ref[0, 3],
        wsp_ref, sps_ref, spb_ref, "space")

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


def _dense_operands(node: Dict[str, Any]):
    """Quantized dense node -> (kernel_q, folded out scale (1, n), bias
    (1, n), act inv scalar). Same math as ops/block.py."""
    act = jnp.maximum(node["act_scale"].astype(jnp.float32).reshape(()),
                      QUANT_EPS)
    out_scale = (act / 127.0) * node["scale"].astype(jnp.float32)
    return (node["kernel_q"], out_scale.reshape(1, -1),
            node["bias"].astype(jnp.float32).reshape(1, -1), 127.0 / act)


def fused_fit_int8_layer(x: jnp.ndarray, layer: Dict[str, Any], heads: int,
                         frames: int, block_rows: int = 1,
                         ln_eps: float = FIT_LN_EPS,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """x (B, 1+F*P, W) bf16 + one SpaceTimeBlock's quantized param node
    (norm1/norm2/norm3 with weight/bias; attn.qkv/attn.proj, timeattn.qkv/
    timeattn.proj, mlp_fc1, mlp_fc2 as {kernel_q, scale, bias, act_scale})
    -> (B, 1+F*P, W) bf16. The activation operand is ALIASED to the output
    (callers must treat it as donated); weights are VMEM-resident across the
    batch grid via constant index maps."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

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

    operands = [
        x, invs,
        ln_vec("norm3", "weight"), ln_vec("norm3", "bias"), wtq, tqs, tqb,
        wtp, tps, tpb,
        ln_vec("norm1", "weight"), ln_vec("norm1", "bias"), wsq, sqs, sqb,
        wsp, sps, spb,
        ln_vec("norm2", "weight"), ln_vec("norm2", "bias"), wf, fs2, fb2, kv,
        wp, ps, pb,
    ]
    kernel = functools.partial(_fit_layer_kernel, heads=heads, frames=frames,
                               approx_recip=not interpret, ln_eps=ln_eps)

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
