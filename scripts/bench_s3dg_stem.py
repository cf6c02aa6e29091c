#!/usr/bin/env python
"""A/B the S3DG stem: space-to-depth + conv(2,4,4) vs the mathematically
identical direct strided conv(4,8,8, stride 2) with a permuted kernel.

The device trace (scripts/profile_s3dg.py) shows the s2d path costs
~7.1 ms of the 15.8 ms eval forward at batch 16x16f: 2.7 ms of layout
copies (cast + transpose + reshape) plus a 4.4 ms conv running at
~41 TFLOP/s (the 24-deep input contraction can't fill the MXU). The
strided form feeds the conv the raw (B,T,224,224,3) tensor — the same
shape class where the CLIP patch conv measured 93 TFLOP/s
(scripts/bench_patch_conv.py).

Equivalence: s2d cell (t',h',w') holds original block (2t'+t2, 2h'+h2,
2w'+w2, c), so a (2,4,4) conv over the s2d grid with pad (1,2,2) reads
original coords 2o+T-2 for T=2kt+t2 in [0,4) etc. — i.e. a (4,8,8)
kernel, stride 2, pad (2,4,4), with
K'[2kt+t2, 2kh+h2, 2kw+w2, c, o] = K[kt, kh, kw, (t2,h2,w2,c), o].

Prints one JSON line per case.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.s3dg import space_to_depth
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    batch = int(os.environ.get("BENCH_CLIPS", "16"))
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.normal(size=(batch, 16, 224, 224, 3)).astype(np.float32))
    kernel = jnp.asarray(
        (rng.normal(size=(2, 4, 4, 24, 64)) * 0.05).astype(np.float32),
        dtype=jnp.bfloat16)

    def s2d_path(video, kernel):
        x = space_to_depth(video.astype(jnp.bfloat16))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NTHWC", "THWIO", "NTHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1),
            padding=[(1, 1), (2, 2), (2, 2)], dimension_numbers=dn)
        return y[:, 1:, 1:, 1:, :]

    def strided_kernel(kernel):
        # (kt,kh,kw, t2*12+h2*6+w2*3+c, o) -> (2kt+t2, 2kh+h2, 2kw+w2, c, o)
        k = kernel.reshape(2, 4, 4, 2, 2, 2, 3, -1)
        k = k.transpose(0, 3, 1, 4, 2, 5, 6, 7)  # kt,t2,kh,h2,kw,w2,c,o
        return k.reshape(4, 8, 8, 3, -1)

    def strided_path(video, kernel):
        x = video.astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NTHWC", "THWIO", "NTHWC"))
        y = jax.lax.conv_general_dilated(
            x, strided_kernel(kernel), window_strides=(2, 2, 2),
            padding=[(2, 2), (4, 4), (4, 4)], dimension_numbers=dn)
        return y[:, 1:, 1:, 1:, :]

    a = np.asarray(jax.jit(s2d_path)(video, kernel), np.float32)
    b = np.asarray(jax.jit(strided_path)(video, kernel), np.float32)
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
    maxrel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
    print(json.dumps({"check": "equivalence", "cosine": round(cos, 8),
                      "max_rel": round(maxrel, 6)}), flush=True)
    assert cos > 0.9999, cos

    flops = a.shape[0] * 9 * 113 * 113 * 64 * 768 * 2  # pre-slice output
    for name, fn in [("s2d", s2d_path), ("strided", strided_path)]:
        @jax.jit
        def chain(video, kernel, steps, fn=fn):
            def body(i, carry):
                v = video * (1.0 + carry.astype(jnp.float32) * 1e-6)
                y = fn(v, kernel)
                return carry + (jnp.abs(y).sum() > 0).astype(jnp.int32)
            return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

        sec = sustained_seconds_per_step(
            lambda s: chain(video, kernel, jnp.int32(s)))
        print(json.dumps({"case": name, "ms": round(sec * 1e3, 3),
                          "tflops": round(flops / sec / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
