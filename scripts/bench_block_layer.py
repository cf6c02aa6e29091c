#!/usr/bin/env python
"""Ablation timing for the whole-layer int8 megakernel (ops/block.py).

Times one ViT-B/16 layer at production shape (512 frames, L=197, W=768) with
pieces toggled, to locate the in-kernel critical path (the kernel serializes
VPU stages with MXU stages within a grid step):

  full        the shipping kernel body
  noattn      attention core replaced by a slice of qkv (isolates its cost)
  nomlp       MLP half skipped
  bf16gelu    GELU + h-quantize in bf16 instead of fp32
  noquant     int8 denses fed a cheap cast instead of round/clip quantize
  b2 / b4     block_rows sweep (with the 100MB VMEM budget)

Round-3 cases (the levers VERDICT.md names):
  mlpfold     fc epilogue with the requant scale folded INTO the dequant
              (t = acc*(fs*inv_p) + fb*inv_p), QuickGELU via exp2 + approx
              reciprocal, one round/clip — ~10 VPU passes over (L, 4W)
              instead of ~14, and exp2/rsqrt-class transcendentals only
  mlpfold16   same but the dequant/exp2/reciprocal passes in bf16 (packed
              lanes); only the final round runs in f32
  sm2         softmax via exp2 with log2(e) and the q-scale BOTH folded into
              the QKV dense's dequant scale (zero per-head q scaling), and
              the divide replaced by an approx-reciprocal multiply
  sm2mlp16    sm2 + mlpfold16 combined
  heads3      head loop split into phases (all QK^T, then all softmax, then
              all AV) to hand Mosaic's scheduler independent VPU/MXU chains
"""
import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = int(os.environ.get("BENCH_BLOCK_FRAMES", "512"))
SEQ = 197
WIDTH = 768
HEADS = 12


def make_layer_params(rng):
    import jax.numpy as jnp

    def dense(n_in, n_out):
        w = rng.normal(size=(n_in, n_out)).astype(np.float32) * 0.02
        from fitclip_tpu.ops.quant import quantize_weight

        q = quantize_weight(w)
        return {"kernel_q": jnp.asarray(q["kernel_q"]),
                "scale": jnp.asarray(q["scale"]),
                "bias": jnp.asarray(rng.normal(size=n_out).astype(np.float32) * 0.01),
                "act_scale": jnp.asarray(np.asarray([3.0], np.float32))}

    def ln():
        return {"ln": {"scale": jnp.asarray(np.ones(WIDTH, np.float32)),
                       "bias": jnp.asarray(np.zeros(WIDTH, np.float32))}}

    return {
        "ln_1": ln(), "ln_2": ln(),
        "attn": {"in_proj": dense(WIDTH, 3 * WIDTH),
                 "out_proj": dense(WIDTH, WIDTH)},
        "mlp_fc": dense(WIDTH, 4 * WIDTH),
        "mlp_proj": dense(4 * WIDTH, WIDTH),
    }


def make_skew_run():
    """Software-pipelined layer: grid step i runs the MLP half of frame i-1
    (from a VMEM scratch carry) and the attention half of frame i. The two
    halves are data-independent, giving Mosaic's scheduler a VPU-heavy chain
    (attention softmax/pack) to interleave with an MXU-heavy chain (MLP
    matmuls) inside every step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fitclip_tpu.ops.block import (_attention_core, _dense_operands,
                                       _int8_dense, _ln, _quant)

    def kernel(x_ref, invs_ref,
               ln1_s_ref, ln1_b_ref, wq_ref, qs_ref, qb_ref,
               wo_ref, os_ref, ob_ref,
               ln2_s_ref, ln2_b_ref, wf_ref, fs_ref, fb_ref,
               wp_ref, ps_ref, pb_ref, fsb_ref, fbb_ref, invfb_ref,
               y_ref, x2_scratch):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        # MLP half of the PREVIOUS frame (reads the scratch before the
        # attention half overwrites it).
        @pl.when(i > 0)
        def _():
            x32 = x2_scratch[...]
            h2_q = _quant(_ln(x32, ln2_s_ref, ln2_b_ref), invs_ref[0, 2])
            h = _int8_dense(h2_q, wf_ref, fs_ref, fb_ref)
            h = h * jax.nn.sigmoid(1.702 * h)
            h_q = _quant(h, invs_ref[0, 3])
            y_ref[...] = (x32 + _int8_dense(h_q, wp_ref, ps_ref, pb_ref)
                          ).astype(y_ref.dtype)

        # Attention half of the CURRENT frame.
        @pl.when(i < n - 1)
        def _():
            x = x_ref[...]
            x32 = x.astype(jnp.float32)
            width = x.shape[-1]
            h1_q = _quant(_ln(x32, ln1_s_ref, ln1_b_ref), invs_ref[0, 0])
            qkv = _int8_dense(h1_q, wq_ref, qs_ref, qb_ref).astype(x.dtype)
            att = _attention_core(qkv, HEADS, (width // HEADS) ** -0.5, False,
                                  jnp.float32)
            att_q = _quant(att, invs_ref[0, 1])
            x2_scratch[...] = x32 + _int8_dense(att_q, wo_ref, os_ref, ob_ref)

    def run(x, layer):
        batch, seq, width = x.shape
        wq, qs, qb, inv_q = _dense_operands(layer["attn"]["in_proj"])
        wo, osc, ob, inv_o = _dense_operands(layer["attn"]["out_proj"])
        wf, fs, fb, inv_f = _dense_operands(layer["mlp_fc"])
        wp, ps, pb, inv_p = _dense_operands(layer["mlp_proj"])
        invs = jnp.stack([inv_q, inv_o, inv_f, inv_p]).reshape(1, 4)

        def ln_vec(name, leaf):
            return layer[name]["ln"][leaf].astype(jnp.float32).reshape(1, -1)

        operands = [x, invs,
                    ln_vec("ln_1", "scale"), ln_vec("ln_1", "bias"), wq, qs, qb,
                    wo, osc, ob,
                    ln_vec("ln_2", "scale"), ln_vec("ln_2", "bias"), wf, fs, fb,
                    wp, ps, pb,
                    fs.astype(jnp.bfloat16), fb.astype(jnp.bfloat16),
                    jnp.full((1, 4 * WIDTH), inv_f, jnp.bfloat16)]
        interpret = jax.default_backend() != "tpu"
        memory_space = pltpu.ANY if interpret else pltpu.VMEM
        smem = pltpu.ANY if interpret else pltpu.SMEM
        last = batch - 1

        in_specs = [pl.BlockSpec((1, seq, width),
                                 lambda i: (jnp.minimum(i, last), 0, 0),
                                 memory_space=memory_space),
                    pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=smem)]
        in_specs += [pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                                  memory_space=memory_space)
                     for op in operands[2:]]
        return pl.pallas_call(
            kernel,
            grid=(batch + 1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, seq, width),
                                   lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                                   memory_space=memory_space),
            out_shape=jax.ShapeDtypeStruct((batch, seq, width), x.dtype),
            scratch_shapes=[pltpu.VMEM((1, seq, width), jnp.float32)],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
        )(*operands)

    return run


def make_run(mode: str, block: int, alias: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fitclip_tpu.ops.block import (_attention_core, _dense_operands,
                                       _int8_dense, _ln, _quant)

    LOG2E = 1.4426950408889634
    attn_mode = ("sm2" if mode in ("sm2", "sm2mlp16", "smf")
                 else "sm2div" if mode in ("sm2div", "smfdiv")
                 else "heads3" if mode == "heads3" else mode)
    mlp_mode = ("fold16" if mode in ("mlpfold16", "sm2mlp16")
                else "fold" if mode in ("mlpfold", "smf")
                else "folddiv" if mode == "smfdiv"
                else "bf16" if mode == "bf16gelu" else "base")

    def kernel(x_ref, invs_ref,
               ln1_s_ref, ln1_b_ref, wq_ref, qs_ref, qb_ref,
               wo_ref, os_ref, ob_ref,
               ln2_s_ref, ln2_b_ref, wf_ref, fs_ref, fb_ref,
               wp_ref, ps_ref, pb_ref, fsb_ref, fbb_ref, invfb_ref,
               fs2_ref, fb2_ref, kv_ref, fs2b_ref, fb2b_ref, kvb_ref,
               y_ref):
        x = x_ref[...]
        x32 = x.astype(jnp.float32)
        width = x.shape[-1]
        head_dim = width // HEADS

        def quant(v32, inv):
            if mode == "noquant":
                return v32.astype(jnp.int8)
            return _quant(v32, inv)

        def ln_fn(x32_in, s_ref, b_ref):
            if mode != "lnvar":
                return _ln(x32_in, s_ref, b_ref)
            # Single-pass variance: E[x^2] - E[x]^2 — one read of the tensor
            # for both statistics instead of two (cancellation risk is why
            # the shipping kernel uses the two-pass form; this measures the
            # speed side of that trade).
            mean = jnp.mean(x32_in, axis=-1, keepdims=True)
            msq = jnp.mean(x32_in * x32_in, axis=-1, keepdims=True)
            normed = (x32_in - mean) * jax.lax.rsqrt(msq - mean * mean + 1e-5)
            return normed * s_ref[...][0] + b_ref[...][0]

        def ln_quant(x32_in, s_ref, b_ref, inv):
            """LN with the quantize multiplier folded into the affine: one
            multiply pass fewer over the (L, W) tensor."""
            if mode != "lnfold":
                return quant(ln_fn(x32_in, s_ref, b_ref), inv)
            mean = jnp.mean(x32_in, axis=-1, keepdims=True)
            centered = x32_in - mean
            var = jnp.mean(centered * centered, axis=-1, keepdims=True)
            normed = centered * jax.lax.rsqrt(var + 1e-5)
            scaled = normed * (s_ref[...][0] * inv) + b_ref[...][0] * inv
            return jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)

        h1_q = ln_quant(x32, ln1_s_ref, ln1_b_ref, invs_ref[0, 0])
        qkv = _int8_dense(h1_q, wq_ref, qs_ref, qb_ref).astype(x.dtype)
        if attn_mode in ("sm2", "sm2div"):
            # The q-scale (D^-0.5 * log2e) is folded into the QKV dense's
            # dequant scale columns outside the kernel: logits come out in
            # log2 units with NO per-head q multiply. exp2 is the native
            # transcendental; the divide becomes an approx-reciprocal mul.
            parts = []
            for h in range(HEADS):
                qh = qkv[:, :, h * head_dim:(h + 1) * head_dim]
                kh = qkv[:, :, width + h * head_dim:width + (h + 1) * head_dim]
                vh = qkv[:, :, 2 * width + h * head_dim:
                         2 * width + (h + 1) * head_dim]
                logits = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                peak = jnp.max(logits, axis=-1, keepdims=True)
                exps = jnp.exp2(logits - peak)
                denom = jnp.sum(exps, axis=-1, keepdims=True)
                w = (exps / denom if attn_mode == "sm2div"
                     else exps * pl.reciprocal(denom, approx=True)).astype(vh.dtype)
                parts.append(jax.lax.dot_general(
                    w, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))
            att = jnp.concatenate(parts, axis=2)
        elif mode == "noattn":
            att = qkv[:, :, :width].astype(jnp.float32)
        elif mode in ("avfold", "avfold2", "lnvar"):
            # Fold the attention-output requant multiplier inv_o INTO the
            # softmax normalizer: w = exps * (inv_o/denom), so AV outputs come
            # out pre-scaled and the (L, W) att*inv pass disappears — the
            # quant is just round/clip. bf16 w precision is unaffected by the
            # scaling (pure exponent shift). avfold2 also uses exp2+approx
            # reciprocal for the softmax itself.
            scale_q = jnp.asarray(head_dim ** -0.5, qkv.dtype)
            inv_o = invs_ref[0, 1]
            parts = []
            for h in range(HEADS):
                qh = qkv[:, :, h * head_dim:(h + 1) * head_dim] * scale_q
                kh = qkv[:, :, width + h * head_dim:width + (h + 1) * head_dim]
                vh = qkv[:, :, 2 * width + h * head_dim:
                         2 * width + (h + 1) * head_dim]
                logits = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                peak = jnp.max(logits, axis=-1, keepdims=True)
                if mode == "avfold2":
                    exps = jnp.exp2((logits - peak)
                                    * jnp.float32(1.4426950408889634))
                    w = (exps * (inv_o * pl.reciprocal(
                        jnp.sum(exps, axis=-1, keepdims=True), approx=True))
                         ).astype(vh.dtype)
                else:
                    exps = jnp.exp(logits - peak)
                    denom = jnp.sum(exps, axis=-1, keepdims=True)
                    w = (exps * (inv_o / denom)).astype(vh.dtype)
                parts.append(jax.lax.dot_general(
                    w, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))
            att_scaled = jnp.concatenate(parts, axis=2)
            att_q8 = jnp.clip(jnp.round(att_scaled), -127, 127).astype(jnp.int8)
            x32 = x32 + _int8_dense(att_q8, wo_ref, os_ref, ob_ref)
            # MLP half: the shipping folded epilogue.
            h2_q = _quant(ln_fn(x32, ln2_s_ref, ln2_b_ref), invs_ref[0, 2])
            acc = jax.lax.dot_general(
                h2_q, wf_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t = acc.astype(jnp.float32) * fs2_ref[...][0] + fb2_ref[...][0]
            e = jnp.exp2(t * kv_ref[...][0])
            g = t * pl.reciprocal(1.0 + e, approx=True)
            h_q = jnp.clip(jnp.round(g), -127, 127).astype(jnp.int8)
            x32 = x32 + _int8_dense(h_q, wp_ref, ps_ref, pb_ref)
            y_ref[...] = x32.astype(y_ref.dtype)
            return
        elif mode == "heads3":
            # Same math as the shipping head loop, but phase-ordered: all 12
            # QK^T matmuls first, then all softmaxes, then all AV matmuls —
            # adjacent independent MXU/VPU chains for the list scheduler.
            scale_q = jnp.asarray(head_dim ** -0.5, qkv.dtype)
            qs_l = [qkv[:, :, h * head_dim:(h + 1) * head_dim] * scale_q
                    for h in range(HEADS)]
            ks_l = [qkv[:, :, width + h * head_dim:width + (h + 1) * head_dim]
                    for h in range(HEADS)]
            vs_l = [qkv[:, :, 2 * width + h * head_dim:
                        2 * width + (h + 1) * head_dim]
                    for h in range(HEADS)]
            logits_l = [jax.lax.dot_general(
                qs_l[h], ks_l[h], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) for h in range(HEADS)]
            ws_l = []
            for h in range(HEADS):
                peak = jnp.max(logits_l[h], axis=-1, keepdims=True)
                exps = jnp.exp(logits_l[h] - peak)
                denom = jnp.sum(exps, axis=-1, keepdims=True)
                ws_l.append((exps / denom).astype(vs_l[h].dtype))
            att = jnp.concatenate(
                [jax.lax.dot_general(
                    ws_l[h], vs_l[h],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                 for h in range(HEADS)], axis=2)
        elif mode == "headloop":
            # Per-head attention without the pack/concat: each head's q/k/v
            # is a 64-lane slice, softmax runs per head, and outputs land in
            # their own lane slice of the accumulator.
            scale_q = jnp.asarray(head_dim ** -0.5, qkv.dtype)
            parts = []
            for h in range(HEADS):
                qh = qkv[:, :, h * head_dim:(h + 1) * head_dim] * scale_q
                kh = qkv[:, :, width + h * head_dim:width + (h + 1) * head_dim]
                vh = qkv[:, :, 2 * width + h * head_dim:
                         2 * width + (h + 1) * head_dim]
                logits = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                peak = jnp.max(logits, axis=-1, keepdims=True)
                exps = jnp.exp(logits - peak)
                denom = jnp.sum(exps, axis=-1, keepdims=True)
                w = (exps / denom).astype(vh.dtype)
                parts.append(jax.lax.dot_general(
                    w, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))
            att = jnp.concatenate(parts, axis=2)
        elif mode == "opt":
            # headloop + per-head int8 requant of the attention output (the
            # concat then moves int8, half the bytes, and out_proj consumes
            # it directly with no separate quantize pass).
            scale_q = jnp.asarray(head_dim ** -0.5, qkv.dtype)
            inv_o = invs_ref[0, 1]
            parts = []
            for h in range(HEADS):
                qh = qkv[:, :, h * head_dim:(h + 1) * head_dim] * scale_q
                kh = qkv[:, :, width + h * head_dim:width + (h + 1) * head_dim]
                vh = qkv[:, :, 2 * width + h * head_dim:
                         2 * width + (h + 1) * head_dim]
                logits = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                peak = jnp.max(logits, axis=-1, keepdims=True)
                exps = jnp.exp(logits - peak)
                denom = jnp.sum(exps, axis=-1, keepdims=True)
                w = (exps / denom).astype(vh.dtype)
                part = jax.lax.dot_general(
                    w, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                parts.append(jnp.clip(jnp.round(part * inv_o), -127, 127)
                             .astype(jnp.int8))
            att_q8 = jnp.concatenate(parts, axis=2)
            x32 = x32 + _int8_dense(att_q8, wo_ref, os_ref, ob_ref)
            h2_q = quant(_ln(x32, ln2_s_ref, ln2_b_ref), invs_ref[0, 2])
            acc = jax.lax.dot_general(
                h2_q, wf_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h = acc.astype(jnp.bfloat16) * fsb_ref[...][0] + fbb_ref[...][0]
            one = jnp.full((1, 1, 1), 1.0, jnp.bfloat16)
            coef = jnp.full((1, 1, 1), 1.702, jnp.bfloat16)
            h = h * (one / (one + jnp.exp(-coef * h)))
            h_q = jnp.clip(jnp.round((h * invfb_ref[...][0])
                                     .astype(jnp.float32)),
                           -127, 127).astype(jnp.int8)
            x32 = x32 + _int8_dense(h_q, wp_ref, ps_ref, pb_ref)
            y_ref[...] = x32.astype(y_ref.dtype)
            return
        elif mode == "softsub":
            # Per-head with TRANSPOSED logits: QK^T computed as (S, L) so the
            # softmax reduces over SUBLANES; AV contracts sublanes x sublanes.
            # Zero transposes anywhere.
            scale_q = jnp.asarray(head_dim ** -0.5, qkv.dtype)
            parts = []
            for h in range(HEADS):
                qh = qkv[:, :, h * head_dim:(h + 1) * head_dim] * scale_q
                kh = qkv[:, :, width + h * head_dim:width + (h + 1) * head_dim]
                vh = qkv[:, :, 2 * width + h * head_dim:
                         2 * width + (h + 1) * head_dim]
                logits_t = jax.lax.dot_general(
                    kh, qh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (BB, S, L)
                peak = jnp.max(logits_t, axis=1, keepdims=True)
                exps = jnp.exp(logits_t - peak)
                denom = jnp.sum(exps, axis=1, keepdims=True)
                w_t = (exps / denom).astype(vh.dtype)
                parts.append(jax.lax.dot_general(
                    w_t, vh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))  # (BB, L, D)
            att = jnp.concatenate(parts, axis=2)
        elif mode == "nomax":
            # Softmax without the max-subtraction pass: CLIP attention logits
            # (LN'd inputs, scaled by D^-0.5) stay far below fp32 exp
            # overflow (~88). Saves one full reduction over the logits.
            scale_q = jnp.asarray(head_dim ** -0.5, qkv.dtype)
            parts = []
            for h in range(HEADS):
                qh = qkv[:, :, h * head_dim:(h + 1) * head_dim] * scale_q
                kh = qkv[:, :, width + h * head_dim:width + (h + 1) * head_dim]
                vh = qkv[:, :, 2 * width + h * head_dim:
                         2 * width + (h + 1) * head_dim]
                logits = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                exps = jnp.exp(logits)
                denom = jnp.sum(exps, axis=-1, keepdims=True)
                w = (exps / denom).astype(vh.dtype)
                parts.append(jax.lax.dot_general(
                    w, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))
            att = jnp.concatenate(parts, axis=2)
        elif mode == "b2split":
            # block_rows=2 for the denses (395-row matmuls) but the
            # attention core per frame, halving its live VMEM.
            att = jnp.concatenate(
                [_attention_core(qkv[i:i + 1], HEADS, head_dim ** -0.5,
                                 False, jnp.float32)
                 for i in range(qkv.shape[0])], axis=0)
        else:
            att = _attention_core(qkv, HEADS, head_dim ** -0.5, False,
                                  jnp.float32)
        att_q = quant(att, invs_ref[0, 1])
        x32 = x32 + _int8_dense(att_q, wo_ref, os_ref, ob_ref)

        if mode != "nomlp":
            h2_q = ln_quant(x32, ln2_s_ref, ln2_b_ref, invs_ref[0, 2])
            if mlp_mode in ("fold", "fold16", "folddiv"):
                # Folded epilogue: the requant multiplier inv_p rides the
                # dequant (t = h*inv_p directly), QuickGELU becomes
                # g(h)*inv_p = t * 1/(1 + exp2(t*k)) with
                # k = -1.702*log2e/inv_p folded outside, and the divide is an
                # approx reciprocal. One round/clip pass total.
                acc = jax.lax.dot_general(
                    h2_q, wf_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if mlp_mode == "fold16":
                    # Mosaic's approx reciprocal is f32-only, so the logistic
                    # denominator uses a bf16 divide; wide passes stay bf16.
                    t = (acc.astype(jnp.bfloat16) * fs2b_ref[...][0]
                         + fb2b_ref[...][0])
                    one = jnp.full((1, 1, 1), 1.0, jnp.bfloat16)
                    e = jnp.exp2(t * kvb_ref[...][0])
                    g = t * (one / (one + e))
                    h_q = jnp.clip(jnp.round(g.astype(jnp.float32)),
                                   -127, 127).astype(jnp.int8)
                else:
                    t = acc.astype(jnp.float32) * fs2_ref[...][0] + fb2_ref[...][0]
                    e = jnp.exp2(t * kv_ref[...][0])
                    g = (t / (1.0 + e) if mlp_mode == "folddiv"
                         else t * pl.reciprocal(1.0 + e, approx=True))
                    h_q = jnp.clip(jnp.round(g), -127, 127).astype(jnp.int8)
            elif mode == "bf16gelu":
                # Whole fc epilogue in bf16: int32 acc -> bf16 dequant (pre-cast
                # bf16 scale/bias vectors) -> bf16 QuickGELU -> bf16 requant
                # (pre-cast (1,1) bf16 inv). No fp32 pass over (L, 4W).
                acc = jax.lax.dot_general(
                    h2_q, wf_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                h = acc.astype(jnp.bfloat16) * fsb_ref[...][0] + fbb_ref[...][0]
                # Explicit bf16 logistic: jax.nn.sigmoid lowers its constants
                # as f32, tripping Mosaic's same-type broadcast verifier.
                one = jnp.full((1, 1, 1), 1.0, jnp.bfloat16)
                coef = jnp.full((1, 1, 1), 1.702, jnp.bfloat16)
                h = h * (one / (one + jnp.exp(-coef * h)))
                # Lane-wide inv vector: a (1,1,1) scalar would need a
                # sublane+lane double broadcast, unimplemented in Mosaic.
                # The round itself must be f32 (math.roundeven has no bf16
                # legalization) — one f32 pass instead of three.
                h_q = jnp.clip(jnp.round((h * invfb_ref[...][0])
                                         .astype(jnp.float32)),
                               -127, 127).astype(jnp.int8)
            else:
                h = _int8_dense(h2_q, wf_ref, fs_ref, fb_ref)
                h = h * jax.nn.sigmoid(1.702 * h)
                h_q = quant(h, invs_ref[0, 3])
            x32 = x32 + _int8_dense(h_q, wp_ref, ps_ref, pb_ref)
        y_ref[...] = x32.astype(y_ref.dtype)

    def run(x, layer):
        batch, seq, width = x.shape
        wq, qs, qb, inv_q = _dense_operands(layer["attn"]["in_proj"])
        wo, osc, ob, inv_o = _dense_operands(layer["attn"]["out_proj"])
        wf, fs, fb, inv_f = _dense_operands(layer["mlp_fc"])
        wp, ps, pb, inv_p = _dense_operands(layer["mlp_proj"])
        invs = jnp.stack([inv_q, inv_o, inv_f, inv_p]).reshape(1, 4)

        def ln_vec(name, leaf):
            return layer[name]["ln"][leaf].astype(jnp.float32).reshape(1, -1)

        if attn_mode in ("sm2", "sm2div"):
            # Fold D^-0.5 * log2e into the Q third of the QKV dense's dequant
            # scale AND bias (q' = q*s needs both scaled).
            s = (WIDTH // HEADS) ** -0.5 * LOG2E
            colmul = jnp.asarray(
                np.where(np.arange(3 * WIDTH) < WIDTH, s, 1.0).astype(np.float32))
            qs = qs * colmul
            qb = qb * colmul

        fs2 = fs * inv_p
        fb2 = fb * inv_p
        kv = jnp.full((1, 4 * WIDTH), 1.0, jnp.float32) * (-1.702 * LOG2E / inv_p)

        operands = [x, invs,
                    ln_vec("ln_1", "scale"), ln_vec("ln_1", "bias"), wq, qs, qb,
                    wo, osc, ob,
                    ln_vec("ln_2", "scale"), ln_vec("ln_2", "bias"), wf, fs, fb,
                    wp, ps, pb,
                    fs.astype(jnp.bfloat16), fb.astype(jnp.bfloat16),
                    jnp.full((1, 4 * WIDTH), inv_p, jnp.bfloat16),
                    fs2, fb2, kv,
                    fs2.astype(jnp.bfloat16), fb2.astype(jnp.bfloat16),
                    kv.astype(jnp.bfloat16)]
        interpret = jax.default_backend() != "tpu"
        memory_space = pltpu.ANY if interpret else pltpu.VMEM
        smem = pltpu.ANY if interpret else pltpu.SMEM

        def resident(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                memory_space=memory_space)

        in_specs = [pl.BlockSpec((block, seq, width), lambda i: (i, 0, 0),
                                 memory_space=memory_space),
                    pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=smem)]
        in_specs += [resident(op) for op in operands[2:]]
        aliases = {0: 0} if alias else {}
        return pl.pallas_call(
            kernel,
            grid=(batch // block,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block, seq, width), lambda i: (i, 0, 0),
                                   memory_space=memory_space),
            out_shape=jax.ShapeDtypeStruct((batch, seq, width), x.dtype),
            interpret=interpret,
            input_output_aliases=aliases,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
        )(*operands)

    return run


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    parser = argparse.ArgumentParser()
    parser.add_argument("--cases", default="full,noattn,nomlp,bf16gelu,noquant")
    parser.add_argument("--block", type=int, default=1)
    parser.add_argument("--check", action="store_true",
                        help="also print each case's output cosine vs full")
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(FRAMES, SEQ, WIDTH)).astype(np.float32),
                    dtype=jnp.bfloat16)
    layer = make_layer_params(rng)

    ref_out = None
    if args.check:
        full_run = make_run("full", 1, False)
        ref_out = np.asarray(full_run(x + 0, layer), np.float32).ravel()

    # fp-equivalent FLOPs of the full layer (proj + core + mlp).
    dense_gf = 2 * FRAMES * SEQ * WIDTH * (3 * WIDTH + WIDTH + 8 * WIDTH) / 1e9
    core_gf = 2 * 2 * FRAMES * SEQ * SEQ * WIDTH / 1e9

    for case in args.cases.split(","):
        mode, block, alias = case, args.block, bool(os.environ.get("BENCH_BLOCK_ALIAS"))
        if case.startswith("b") and case[1:].isdigit():
            mode, block = "full", int(case[1:])
        elif case == "b2split":
            block = 2
        elif case == "alias":
            mode, alias = "full", True

        run = make_skew_run() if mode == "skew" else make_run(mode, block, alias)

        @jax.jit
        def chain(steps, x, layer):
            def body(i, carry):
                out = run(x * (1.0 + carry * 1e-6).astype(x.dtype), layer)
                return carry + (jnp.abs(out).sum() > 0).astype(jnp.float32)
            return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

        cos = None
        if ref_out is not None and mode != "skew":
            try:
                out = np.asarray(run(x + 0, layer), np.float32).ravel()
                cos = float(np.dot(out, ref_out)
                            / (np.linalg.norm(out) * np.linalg.norm(ref_out)))
            except Exception as exc:
                print(json.dumps({"case": case, "block": block,
                                  "error": str(exc)[:300]}), flush=True)
                continue

        try:
            seconds = sustained_seconds_per_step(
                lambda s: chain(jnp.int32(s), x, layer))
        except Exception as exc:  # keep the sweep alive past one bad lowering
            print(json.dumps({"case": case, "block": block,
                              "error": str(exc)[:300]}), flush=True)
            continue
        gf = dense_gf + core_gf
        rec = {"case": case, "block": block,
               "ms": round(seconds * 1e3, 3),
               "tflops_fp_equiv": round(gf / seconds / 1e3, 1)}
        if cos is not None:
            rec["cos_vs_full"] = round(cos, 6)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
