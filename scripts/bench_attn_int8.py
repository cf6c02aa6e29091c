#!/usr/bin/env python
"""Measure int8 attention-core variants against the shipping bf16 kernel.

BASELINE.md names the int8 attention core as the next throughput lever: the
bf16 core sustains ~46 TFLOP/s while the int8 MXU path runs the denses at
~320 TOPS. Whether int8 helps HERE is not obvious — QK^T contracts over only
D=64 (half the MXU's 128 depth, and int8 wants even deeper contractions), so
this script measures before we commit a kernel design:

  core_bf16      shipping packed kernel (ops/attention.fused_attention_qkv)
  core_i8qk      int8 QK^T (dynamic per-block q/k scales), bf16 AV
  core_i8qkav    int8 QK^T and int8 AV (softmax weights at fixed 1/127 scale)

Each case times the FULL fused kernel (projection excluded) at the production
shape (512 frames, L=197, W=768, 12 heads) with the chained-loop method and
reports achieved TFLOP/s on the attention-core FLOPs plus max cosine error vs
the fp32 einsum oracle.
"""
import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = int(os.environ.get("BENCH_ATTN_FRAMES", "512"))
SEQ = 197
WIDTH = 768
HEADS = 12
HEAD_DIM = WIDTH // HEADS


def _variant_kernel(qkv_ref, o_ref, *, heads: int, scale: float, mode: str):
    """Packed attention core with selectable implementation strategy.

    mode:
      bf16       reference math, mirrors ops/attention._packed_kernel
      i8qk       int8 QK^T (dynamic per-block q/k scales), bf16 AV
      i8qkav     int8 QK^T and int8 AV (weights at fixed 1/127 scale)
      nt         no K transpose: QK^T as a lane-lane ("nt") contraction
      bf16logits MXU accumulates QK^T straight to bf16 logits; softmax with a
                 bf16 exp and fp32 sum (halves the (L,L) VMEM traffic)
      nosoftmax  TIMING ONLY: skip max/exp/sum/div (isolates softmax cost)
      nopack     TIMING ONLY: single-head-shaped matmuls on the first head
                 repeated H times (isolates the packing/concat cost)"""
    import jax
    import jax.numpy as jnp

    block_b, seq, width = o_ref.shape
    head_dim = width // heads
    qkv = qkv_ref[...]

    def heads_along_batch(offset, transpose):
        parts = [qkv[:, :, offset + h * head_dim:offset + (h + 1) * head_dim]
                 for h in range(heads)]
        if transpose:
            parts = [part.swapaxes(1, 2) for part in parts]
        return jnp.concatenate(parts, axis=0)

    if mode == "nt":
        q = heads_along_batch(0, False) * jnp.asarray(scale, qkv.dtype)
        k = heads_along_batch(width, False)
        v = heads_along_batch(2 * width, False)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        peak = jnp.max(logits, axis=-1, keepdims=True)
        exps = jnp.exp(logits - peak)
        denom = jnp.sum(exps, axis=-1, keepdims=True)
        weights = (exps / denom).astype(v.dtype)
        out = jax.lax.dot_general(
            weights, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = jnp.concatenate(
            [out[h * block_b:(h + 1) * block_b] for h in range(heads)],
            axis=2).astype(o_ref.dtype)
        return

    if mode == "bf16logits":
        q = heads_along_batch(0, False) * jnp.asarray(scale, qkv.dtype)
        k_t = heads_along_batch(width, True)
        v = heads_along_batch(2 * width, False)
        logits = jax.lax.dot_general(
            q, k_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        peak = jnp.max(logits, axis=-1, keepdims=True)
        exps = jnp.exp(logits - peak)
        denom = jnp.sum(exps.astype(jnp.float32), axis=-1, keepdims=True)
        weights = exps * (1.0 / denom).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            weights, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = jnp.concatenate(
            [out[h * block_b:(h + 1) * block_b] for h in range(heads)],
            axis=2).astype(o_ref.dtype)
        return

    if mode == "nosoftmax":
        q = heads_along_batch(0, False) * jnp.asarray(scale, qkv.dtype)
        k_t = heads_along_batch(width, True)
        v = heads_along_batch(2 * width, False)
        logits = jax.lax.dot_general(
            q, k_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        weights = logits.astype(v.dtype)
        out = jax.lax.dot_general(
            weights, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = jnp.concatenate(
            [out[h * block_b:(h + 1) * block_b] for h in range(heads)],
            axis=2).astype(o_ref.dtype)
        return

    if mode == "nopack":
        q0 = qkv[:, :, 0:head_dim] * jnp.asarray(scale, qkv.dtype)
        k0_t = qkv[:, :, width:width + head_dim].swapaxes(1, 2)
        v0 = qkv[:, :, 2 * width:2 * width + head_dim]
        for h in range(heads):
            # Per-head perturbation defeats CSE so all 12 matmuls execute.
            qh = q0 * jnp.asarray(1.0 + h * 1e-6, q0.dtype)
            logits = jax.lax.dot_general(
                qh, k0_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            peak = jnp.max(logits, axis=-1, keepdims=True)
            exps = jnp.exp(logits - peak)
            denom = jnp.sum(exps, axis=-1, keepdims=True)
            weights = (exps / denom).astype(v0.dtype)
            out = jax.lax.dot_general(
                weights, v0, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[:, :, h * head_dim:(h + 1) * head_dim] = out.astype(o_ref.dtype)
        return

    q = heads_along_batch(0, False)
    k_t = heads_along_batch(width, True)
    v = heads_along_batch(2 * width, False)

    if mode == "bf16":
        qs = q * jnp.asarray(scale, q.dtype)
        logits = jax.lax.dot_general(
            qs, k_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    else:
        # Dynamic per-block symmetric int8: one scalar scale each for q and k.
        q32 = q.astype(jnp.float32)
        k32 = k_t.astype(jnp.float32)
        q_amax = jnp.maximum(jnp.max(jnp.abs(q32)), 1e-6)
        k_amax = jnp.maximum(jnp.max(jnp.abs(k32)), 1e-6)
        q_i8 = jnp.clip(jnp.round(q32 * (127.0 / q_amax)), -127, 127).astype(jnp.int8)
        k_i8 = jnp.clip(jnp.round(k32 * (127.0 / k_amax)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q_i8, k_i8, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        logits = acc.astype(jnp.float32) * (q_amax * k_amax * scale / (127.0 * 127.0))

    peak = jnp.max(logits, axis=-1, keepdims=True)
    exps = jnp.exp(logits - peak)
    denom = jnp.sum(exps, axis=-1, keepdims=True)

    if mode == "i8qkav":
        # weights in [0,1]: fixed 127 scale; v: dynamic per-block scale.
        w_i8 = jnp.round(exps / denom * 127.0).astype(jnp.int8)
        v32 = v.astype(jnp.float32)
        v_amax = jnp.maximum(jnp.max(jnp.abs(v32)), 1e-6)
        v_i8 = jnp.clip(jnp.round(v32 * (127.0 / v_amax)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            w_i8, v_i8, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (v_amax / (127.0 * 127.0))
    else:
        weights = (exps / denom).astype(v.dtype)
        out = jax.lax.dot_general(
            weights, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    o_ref[...] = jnp.concatenate(
        [out[h * block_b:(h + 1) * block_b] for h in range(heads)],
        axis=2).astype(o_ref.dtype)


def make_variant(mode: str, block: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def run(qkv):
        batch, seq, triple_width = qkv.shape
        width = triple_width // 3
        kernel = functools.partial(_variant_kernel, heads=HEADS,
                                   scale=HEAD_DIM ** -0.5, mode=mode)
        interpret = jax.default_backend() != "tpu"
        memory_space = pltpu.ANY if interpret else pltpu.VMEM
        vmem_mb = int(os.environ.get("BENCH_ATTN_VMEM_MB", "0"))
        params = (pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2 ** 20)
                  if vmem_mb else None)
        return pl.pallas_call(
            kernel,
            grid=(batch // block,),
            in_specs=[pl.BlockSpec((block, seq, triple_width), lambda i: (i, 0, 0),
                                   memory_space=memory_space)],
            out_specs=pl.BlockSpec((block, seq, width), lambda i: (i, 0, 0),
                                   memory_space=memory_space),
            out_shape=jax.ShapeDtypeStruct((batch, seq, width), qkv.dtype),
            interpret=interpret,
            compiler_params=params,
        )(qkv)

    return run


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    parser = argparse.ArgumentParser()
    parser.add_argument("--cases", default="core_bf16,core_i8qk,core_i8qkav")
    parser.add_argument("--block", type=int, default=0,
                        help="batch rows per grid cell (0 = 1, the VMEM fit "
                             "at production shapes)")
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    qkv_np = rng.normal(size=(FRAMES, SEQ, 3 * WIDTH)).astype(np.float32) * 0.7
    qkv = jnp.asarray(qkv_np, dtype=jnp.bfloat16)
    block = args.block or 1

    # fp32 oracle on a small slice for the accuracy column.
    def oracle(qkv_small):
        q, k, v = np.split(qkv_small.astype(np.float32), 3, axis=-1)
        def heads(t):
            return t.reshape(t.shape[0], SEQ, HEADS, HEAD_DIM)
        q, k, v = heads(q), heads(k), heads(v)
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) * (HEAD_DIM ** -0.5)
        logits -= logits.max(-1, keepdims=True)
        w = np.exp(logits)
        w /= w.sum(-1, keepdims=True)
        out = np.einsum("bhqk,bkhd->bqhd", w, v)
        return out.reshape(t_small, SEQ, WIDTH)

    t_small = 8
    ref = oracle(qkv_np[:t_small])

    # attention-core FLOPs only (QK^T + AV), fp-equivalent count.
    gflop = 2 * 2 * FRAMES * SEQ * SEQ * WIDTH / 1e9

    for mode_name in args.cases.split(","):
        mode = mode_name.replace("core_", "")
        run = make_variant(mode, block)
        got = np.asarray(run(qkv[:t_small]), np.float32)
        num = (got * ref).sum(-1)
        den = (np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9)
        cos = float((num / den).min())

        @jax.jit
        def chain(steps, qkv):
            def body(i, carry):
                # Real data dependency so XLA can't hoist the call out of the
                # loop: the carry perturbs the input each iteration.
                out = run(qkv * (1.0 + carry * 1e-6).astype(qkv.dtype))
                return carry + (jnp.abs(out).sum() > 0).astype(jnp.float32)
            return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

        seconds = sustained_seconds_per_step(lambda s: chain(jnp.int32(s), qkv))
        print(json.dumps({
            "case": mode_name, "block": block,
            "ms": round(seconds * 1e3, 3),
            "tflops": round(gflop / seconds / 1e3, 1),
            "min_cosine_vs_fp32": round(cos, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
