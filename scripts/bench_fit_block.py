#!/usr/bin/env python
"""Standalone FiT whole-block megakernel forensics at eval shape (32 clips,
785 tokens, W=768). Relay-safe timing per fitclip_tpu/utils/benchmarking.py.
One JSON line per case.

Cases (default sweep):
  full       the shipping kernel body (ops/fit_block._fit_layer_kernel)
  b2 / b4    block_rows sweep of the shipping kernel
  noattn     both attention halves replaced by a qkv slice -> the dense+LN+
             quant floor
  notime     time half's attention replaced by a slice (denses kept)
  nospace    space half's attention replaced by a slice (denses kept)
  nocls      frame attentions kept, the two CLS global rows skipped
  nomlp      MLP half skipped

Usage: python scripts/bench_fit_block.py [case ...]
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_CASES = ["full", "b2", "noattn", "notime", "nospace", "nocls", "nomlp"]


def make_variant(mode: str):
    """A copy of ops/fit_block._fit_layer_kernel with pieces toggled; 'full'
    delegates to the shipping kernel so the baseline is the real body."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from fitclip_tpu.ops.block import LOG2E, _int8_dense, _ln, _quant
    from fitclip_tpu.ops import fit_block as fb

    def kernel(x_ref, invs_ref,
               ln3_s_ref, ln3_b_ref, wtq_ref, tqs_ref, tqb_ref,
               wtp_ref, tps_ref, tpb_ref,
               ln1_s_ref, ln1_b_ref, wsq_ref, sqs_ref, sqb_ref,
               wsp_ref, sps_ref, spb_ref,
               ln2_s_ref, ln2_b_ref, wf_ref, fs2_ref, fb2_ref, kv_ref,
               wp_ref, ps_ref, pb_ref, y_ref, *,
               heads: int, frames: int):
        x = x_ref[...]
        x32 = x.astype(jnp.float32)
        n, width = x.shape[-2], x.shape[-1]
        patches = (n - 1) // frames
        scale = (width // heads) ** -0.5

        def attention_half(h32, inv_in, wq_ref, qs_ref, qb_ref, inv_out,
                           wo_ref, os_ref, ob_ref, attn_mode):
            h_q = _quant(h32, inv_in)
            qkv = _int8_dense(h_q, wq_ref, qs_ref, qb_ref).astype(x.dtype)
            if attn_mode == "skip":
                att = qkv[:, :, :width].astype(jnp.float32) * inv_out
            else:
                if mode == "nocls":
                    cls_out = qkv[:, :1, :width].astype(jnp.float32) * inv_out
                else:
                    cls_out = fb._cls_global_row(qkv, heads, scale, inv_out)
                if attn_mode == "space":
                    rows = fb._space_attention(qkv, heads, frames, patches,
                                               scale, inv_out)
                else:
                    rows = fb._time_attention(qkv, heads, frames, patches,
                                              scale, inv_out)
                att = jnp.concatenate([cls_out, rows], axis=1)
            att_q = jnp.clip(jnp.round(att), -127, 127).astype(jnp.int8)
            return _int8_dense(att_q, wo_ref, os_ref, ob_ref)

        time_mode = "skip" if mode in ("noattn", "notime") else "time"
        space_mode = "skip" if mode in ("noattn", "nospace") else "space"
        t32 = x32 + attention_half(
            _ln(x32, ln3_s_ref, ln3_b_ref, fb.FIT_LN_EPS), invs_ref[0, 0],
            wtq_ref, tqs_ref, tqb_ref, invs_ref[0, 1],
            wtp_ref, tps_ref, tpb_ref, time_mode)
        s32 = x32 + attention_half(
            _ln(t32, ln1_s_ref, ln1_b_ref, fb.FIT_LN_EPS), invs_ref[0, 2],
            wsq_ref, sqs_ref, sqb_ref, invs_ref[0, 3],
            wsp_ref, sps_ref, spb_ref, space_mode)

        if mode == "nomlp":
            y_ref[...] = s32.astype(y_ref.dtype)
            return
        h2_q = _quant(_ln(s32, ln2_s_ref, ln2_b_ref, fb.FIT_LN_EPS),
                      invs_ref[0, 4])
        acc = jax.lax.dot_general(
            h2_q, wf_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        t = acc.astype(jnp.float32) * fs2_ref[...][0] + fb2_ref[...][0]
        z = t * kv_ref[...][0]
        az = jnp.abs(z)
        u = pl.reciprocal(1.0 + 0.3275911 * az, approx=True)
        poly = u * (0.254829592 + u * (-0.284496736 + u * (
            1.421413741 + u * (-1.453152027 + u * 1.061405429))))
        pe = poly * jnp.exp2((-LOG2E) * az * az)
        erf = jnp.where(z < 0.0, pe - 1.0, 1.0 - pe)
        g = 0.5 * t * (1.0 + erf)
        h_q = jnp.clip(jnp.round(g), -127, 127).astype(jnp.int8)
        y_ref[...] = (s32 + _int8_dense(h_q, wp_ref, ps_ref, pb_ref)) \
            .astype(y_ref.dtype)

    return kernel


def launch_variant(mode: str, x, layer, heads: int, frames: int,
                   block_rows: int):
    """Launch either the shipping kernel or a variant with the same operand
    plumbing (duplicated from fused_fit_int8_layer's tail)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fitclip_tpu.ops import fit_block as fb

    if mode == "full":
        return fb.fused_fit_int8_layer(x, layer, heads, frames=frames,
                                       block_rows=block_rows)

    wtq, tqs, tqb, inv_tq = fb._dense_operands(layer["timeattn"]["qkv"])
    wtp, tps, tpb, inv_tp = fb._dense_operands(layer["timeattn"]["proj"])
    wsq, sqs, sqb, inv_sq = fb._dense_operands(layer["attn"]["qkv"])
    wsp, sps, spb, inv_sp = fb._dense_operands(layer["attn"]["proj"])
    wf, fs, fb_, inv_f = fb._dense_operands(layer["mlp_fc1"])
    wp, ps, pb, inv_p = fb._dense_operands(layer["mlp_fc2"])
    invs = jnp.stack([inv_tq, inv_tp, inv_sq, inv_sp, inv_f, inv_p]) \
        .reshape(1, 6)
    fs2, fb2 = fs * inv_p, fb_ * inv_p
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
    kernel = functools.partial(make_variant(mode), heads=heads, frames=frames)
    batch, seq, width = x.shape
    block = block_rows
    while batch % block:
        block -= 1
    in_specs = [pl.BlockSpec((block, seq, width), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for idx, op in enumerate(operands[1:], start=1):
        in_specs.append(pl.BlockSpec(
            op.shape, lambda i, nd=op.ndim: (0,) * nd,
            memory_space=pltpu.SMEM if idx == 1 else pltpu.VMEM))
    return pl.pallas_call(
        kernel, grid=(batch // block,), in_specs=in_specs,
        out_specs=pl.BlockSpec((block, seq, width), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, seq, width), x.dtype),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(*operands)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.frozen_in_time.encoder import (
        FrozenInTimeConfig, FrozenInTimeVideoTextEncoder)
    from fitclip_tpu.ops.quant import apply_act_scales
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    cases = sys.argv[1:] or DEFAULT_CASES
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

    for case in cases:
        mode, block_rows = case, 1
        if case.startswith("b") and case[1:].isdigit():
            mode, block_rows = "full", int(case[1:])

        if mode == "pad8":
            # Round-4 alignment experiment: same math on the padded layout
            # ([CLS | 7 dead | F x ceil8(P)] rows, masked dead keys) so every
            # frame slice is sublane-aligned. Per-layer standalone twin of
            # bench_fit_e2e_ab's pad8 arm.
            from fitclip_tpu.ops.fit_block import fused_fit_int8_layer_pad
            patches = (n - 1) // cfg.num_frames
            group = -(-patches // 8) * 8
            pad_n = 8 + cfg.num_frames * group
            xp8 = jnp.pad(
                x[:, 1:].reshape(batch, cfg.num_frames, patches, cfg.embed_dim),
                ((0, 0), (0, 0), (0, group - patches), (0, 0)))
            x8 = jnp.concatenate([
                x[:, :1], jnp.zeros((batch, 7, cfg.embed_dim), x.dtype),
                xp8.reshape(batch, cfg.num_frames * group, cfg.embed_dim)],
                axis=1)
            assert x8.shape[1] == pad_n

            @jax.jit
            def chain(x, steps, x8=x8):
                def body(i, carry):
                    return fused_fit_int8_layer_pad(
                        carry * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)),
                        layer, cfg.num_heads, cfg.num_frames,
                        real_patches=patches)
                return jax.lax.fori_loop(0, steps, body, x8)
        elif mode.startswith("split"):
            from fitclip_tpu.ops.fit_block import fused_fit_int8_layer_split
            block_rows = int(mode[5:]) if mode[5:].isdigit() else 1
            patches = (n - 1) // cfg.num_frames

            @jax.jit
            def chain(x, steps, block_rows=block_rows):
                cls = x[:, :1]
                xp = x[:, 1:].reshape(batch, cfg.num_frames, patches,
                                      cfg.embed_dim)

                def body(i, carry):
                    c, p = carry
                    c = c * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))
                    return fused_fit_int8_layer_split(
                        c, p, layer, cfg.num_heads, block_rows=block_rows)
                c, p = jax.lax.fori_loop(0, steps, body, (cls, xp))
                return c
        else:
            @jax.jit
            def chain(x, steps, mode=mode, block_rows=block_rows):
                def body(i, carry):
                    return launch_variant(
                        mode, carry * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)),
                        layer, cfg.num_heads, cfg.num_frames, block_rows)
                return jax.lax.fori_loop(0, steps, body, x)

        seconds = sustained_seconds_per_step(
            lambda s, x=x: chain(x, jnp.int32(s)))
        print(json.dumps({"case": case,
                          "ms_per_layer": round(seconds * 1e3, 3),
                          "batch_clips": batch}), flush=True)


if __name__ == "__main__":
    main()
