#!/usr/bin/env python
"""Component-level MFU bisection for the ViT-B/16 eval path on one chip.

Times raw-jnp replicas of each tower component at the exact production shapes
(512 frames, seq 197, width 768) with the chained-loop method, and prints
per-component achieved TFLOP/s vs the 197 TFLOP/s bf16 peak. This is how we
decide which kernel/layout work actually moves the headline bench."""
import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = 512
SEQ = 197
WIDTH = 768
HEADS = 12
MLP = 3072
LAYERS = 12
PEAK_TFLOPS = 197.0


def chain_time(fn, *args):
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    @jax.jit
    def chain(steps, *args):
        # fn(carry, *args) -> scalar fp32 carry: the scalar folds back into the
        # next iteration's inputs, forcing sequential on-device execution.
        def body(i, carry):
            return fn(carry, *args)
        return jax.lax.fori_loop(0, steps, body, jnp.float32(1.0))

    return sustained_seconds_per_step(lambda s: chain(jnp.int32(s), *args))


def main() -> None:
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--cases", default="mlp,proj,attn_einsum,attn_pallas,"
                                            "ln_fp32,ln_bf16,block_scan,block_unroll")
    args = parser.parse_args()
    cases = args.cases.split(",")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(FRAMES, SEQ, WIDTH)).astype(np.float32),
                    dtype=jnp.bfloat16)
    w_fc = jnp.asarray(rng.normal(size=(WIDTH, MLP)).astype(np.float32) * 0.02,
                       dtype=jnp.bfloat16)
    w_proj = jnp.asarray(rng.normal(size=(MLP, WIDTH)).astype(np.float32) * 0.02,
                         dtype=jnp.bfloat16)
    w_qkv = jnp.asarray(rng.normal(size=(WIDTH, 3 * WIDTH)).astype(np.float32) * 0.02,
                        dtype=jnp.bfloat16)
    w_out = jnp.asarray(rng.normal(size=(WIDTH, WIDTH)).astype(np.float32) * 0.02,
                        dtype=jnp.bfloat16)

    def quick_gelu(h):
        return h * jax.nn.sigmoid(1.702 * h)

    def mlp(carry, x, w_fc, w_proj):
        h = jnp.dot(x * carry.astype(x.dtype), w_fc)
        h = quick_gelu(h)
        h = jnp.dot(h, w_proj)
        return jnp.abs(h).mean().astype(jnp.float32)

    def proj(carry, x, w_qkv, w_out):
        qkv = jnp.dot(x * carry.astype(x.dtype), w_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = jnp.dot(v, w_out)
        return (jnp.abs(out).mean() + jnp.abs(q).mean() + jnp.abs(k).mean()).astype(jnp.float32)

    def attn_core_einsum(carry, x, w_qkv):
        qkv = jnp.dot(x * carry.astype(x.dtype), w_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        def heads(t):
            return t.reshape(FRAMES, SEQ, HEADS, WIDTH // HEADS)
        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (64 ** -0.5)
        weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        return jnp.abs(out).mean().astype(jnp.float32)

    def attn_core_pallas(carry, x, w_qkv):
        from fitclip_tpu.ops.attention import fused_attention
        qkv = jnp.dot(x * carry.astype(x.dtype), w_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        def heads(t):
            return t.reshape(FRAMES, SEQ, HEADS, WIDTH // HEADS)
        out = fused_attention(heads(q), heads(k), heads(v), causal=False)
        return jnp.abs(out).mean().astype(jnp.float32)

    def ln_fp32(carry, x):
        y = x.astype(jnp.float32) * carry
        mean = y.mean(-1, keepdims=True)
        var = ((y - mean) ** 2).mean(-1, keepdims=True)
        out = ((y - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        return jnp.abs(out).mean().astype(jnp.float32)

    def ln_bf16(carry, x):
        y = x * carry.astype(x.dtype)
        mean = y.mean(-1, keepdims=True, dtype=jnp.float32)
        var = (y.astype(jnp.float32) ** 2).mean(-1, keepdims=True) - mean ** 2
        out = ((y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        return jnp.abs(out).mean().astype(jnp.float32)

    def block(x, fused: bool):
        def one_layer(h):
            y = h.astype(jnp.float32)
            mean = y.mean(-1, keepdims=True)
            var = ((y - mean) ** 2).mean(-1, keepdims=True)
            normed = ((y - mean) * jax.lax.rsqrt(var + 1e-5)).astype(h.dtype)
            qkv = jnp.dot(normed, w_qkv)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            def heads(t):
                return t.reshape(FRAMES, SEQ, HEADS, WIDTH // HEADS)
            if fused:
                from fitclip_tpu.ops.attention import fused_attention
                out = fused_attention(heads(q), heads(k), heads(v), causal=False)
            else:
                logits = jnp.einsum("bqhd,bkhd->bhqk", heads(q), heads(k),
                                    preferred_element_type=jnp.float32) * (64 ** -0.5)
                weights = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
                out = jnp.einsum("bhqk,bkhd->bqhd", weights, heads(v))
            h = h + jnp.dot(out.reshape(FRAMES, SEQ, WIDTH), w_out)
            y = h.astype(jnp.float32)
            mean = y.mean(-1, keepdims=True)
            var = ((y - mean) ** 2).mean(-1, keepdims=True)
            normed = ((y - mean) * jax.lax.rsqrt(var + 1e-5)).astype(h.dtype)
            h2 = quick_gelu(jnp.dot(normed, w_fc))
            return h + jnp.dot(h2, w_proj)
        return one_layer

    def block_scan(carry, x):
        layer = block(x, fused=True)
        def body(h, _):
            return layer(h), None
        h, _ = jax.lax.scan(body, x * carry.astype(x.dtype), None, length=LAYERS)
        return jnp.abs(h).mean().astype(jnp.float32)

    def block_unroll(carry, x):
        layer = block(x, fused=True)
        h = x * carry.astype(x.dtype)
        for _ in range(LAYERS):
            h = layer(h)
        return jnp.abs(h).mean().astype(jnp.float32)

    gflop_mlp = 2 * FRAMES * SEQ * WIDTH * MLP * 2 / 1e9
    gflop_proj = 2 * FRAMES * SEQ * WIDTH * (3 * WIDTH + WIDTH) / 1e9
    gflop_attn = gflop_proj * 3 / 4 + 2 * 2 * FRAMES * SEQ * SEQ * WIDTH / 1e9
    gflop_block = gflop_mlp + gflop_proj + 2 * 2 * FRAMES * SEQ * SEQ * WIDTH / 1e9
    table = {
        "mlp": (mlp, (x, w_fc, w_proj), gflop_mlp),
        "proj": (proj, (x, w_qkv, w_out), gflop_proj),
        "attn_einsum": (attn_core_einsum, (x, w_qkv), gflop_attn),
        "attn_pallas": (attn_core_pallas, (x, w_qkv), gflop_attn),
        "ln_fp32": (ln_fp32, (x,), 0.0),
        "ln_bf16": (ln_bf16, (x,), 0.0),
        "block_scan": (block_scan, (x,), gflop_block * LAYERS),
        "block_unroll": (block_unroll, (x,), gflop_block * LAYERS),
    }
    for name in cases:
        fn, fargs, gflop = table[name]
        seconds = chain_time(fn, *fargs)
        result = {"case": name, "ms": round(seconds * 1e3, 3)}
        if gflop:
            result["tflops"] = round(gflop / seconds / 1e3, 1)
            result["mfu_pct"] = round(100 * gflop / seconds / 1e3 / PEAK_TFLOPS, 1)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
