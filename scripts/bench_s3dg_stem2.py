#!/usr/bin/env python
"""S3DG stem variants, round 2 (after bench_s3dg_stem.py measured the
direct strided-conv form NEGATIVE, 12.4 vs 9.0 ms):

  base     space_to_depth (8-D transpose) + conv(2,4,4) DEFAULT precision
  hi       same conv at precision=HIGHEST (patch-conv finding: no-op-or-
           better for bf16 operands)
  slice    s2d expressed as 4 stride-2 row slices + channel concat on
           (H, W*C)-flattened rows (same math, no 8-D transpose)
  im2col   conv_general_dilated_patches unfold + one 768-deep matmul

All variants are numerics-checked against base before timing. One JSON
line per case.
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

    def conv_s2d(x, kernel, precision=None):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NTHWC", "THWIO", "NTHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1),
            padding=[(1, 1), (2, 2), (2, 2)], dimension_numbers=dn,
            precision=precision)
        return y[:, 1:, 1:, 1:, :]

    def base(video, kernel):
        return conv_s2d(space_to_depth(video.astype(jnp.bfloat16)), kernel)

    def hi(video, kernel):
        return conv_s2d(space_to_depth(video.astype(jnp.bfloat16)), kernel,
                        precision=jax.lax.Precision.HIGHEST)

    def s2d_slices(x):
        b, t, h, w, c = x.shape
        rows = x.reshape(b, t, h, w * c)
        parts = [rows[:, t2::2, h2::2, :].reshape(b, t // 2, h // 2, w // 2, 2 * c)
                 for t2 in (0, 1) for h2 in (0, 1)]
        return jnp.concatenate(parts, axis=-1)

    def slice_path(video, kernel):
        return conv_s2d(s2d_slices(video.astype(jnp.bfloat16)), kernel)

    def im2col_path(video, kernel):
        x = space_to_depth(video.astype(jnp.bfloat16))
        patches = jax.lax.conv_general_dilated_patches(
            x, filter_shape=(2, 4, 4), window_strides=(1, 1, 1),
            padding=[(1, 1), (2, 2), (2, 2)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, (2, 4, 4, 24, 64), ("NTHWC", "THWIO", "NTHWC")))
        # patches channels are ordered (C_in, kt, kh, kw); kernel is
        # (kt, kh, kw, C_in, out) -> align axes before the matmul.
        w = kernel.transpose(3, 0, 1, 2, 4).reshape(-1, kernel.shape[-1])
        y = jnp.einsum("bthwk,ko->bthwo", patches, w)
        return y[:, 1:, 1:, 1:, :]

    ref = np.asarray(jax.jit(base)(video, kernel), np.float32)
    flops = ref.shape[0] * 9 * 113 * 113 * 64 * 768 * 2
    cases = [("base", base), ("hi", hi), ("slice", slice_path),
             ("im2col", im2col_path)]
    for name, fn in cases:
        out = np.asarray(jax.jit(fn)(video, kernel), np.float32)
        cos = float((ref * out).sum() /
                    (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9))
        assert cos > 0.9999, (name, cos)

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

# Variant appended after the first measurement round: fold the
# [:, 1:, 1:, 1:] slice into asymmetric conv padding — the conv emits the
# aligned (8,112,112,64) tensor directly (112 tiles cleanly; 113 doesn't),
# and skips the never-used o=0 shell (~3% of the window positions).
def _asym_main():
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

    def base(video, kernel):
        x = space_to_depth(video.astype(jnp.bfloat16))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NTHWC", "THWIO", "NTHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1),
            padding=[(1, 1), (2, 2), (2, 2)], dimension_numbers=dn)
        return y[:, 1:, 1:, 1:, :]

    def asym(video, kernel):
        x = space_to_depth(video.astype(jnp.bfloat16))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NTHWC", "THWIO", "NTHWC"))
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1),
            padding=[(0, 1), (1, 2), (1, 2)], dimension_numbers=dn)

    a = np.asarray(jax.jit(base)(video, kernel), np.float32)
    b = np.asarray(jax.jit(asym)(video, kernel), np.float32)
    assert a.shape == b.shape, (a.shape, b.shape)
    print(json.dumps({"check": "asym_equal",
                      "max_abs": float(np.abs(a - b).max())}), flush=True)

    flops = a.shape[0] * 8 * 112 * 112 * 64 * 768 * 2
    for name, fn in [("base", base), ("asym", asym)]:
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
