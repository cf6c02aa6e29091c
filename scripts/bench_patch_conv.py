#!/usr/bin/env python
"""Isolate the ViT patch-embedding conv at production shape (512 frames,
224x224x3 bf16, 16x16 stride-16, 768 out): does the HIGHEST precision flag
cost anything with bf16 operands, and what does the conv actually run at?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(512, 224, 224, 3)),
                         dtype=jnp.bfloat16)
    kern = jnp.asarray(rng.normal(size=(16, 16, 3, 768)) * 0.02,
                       dtype=jnp.bfloat16)

    def make(precision):
        def conv(frames, kern, bump):
            f = frames + bump.astype(frames.dtype)
            out = jax.lax.conv_general_dilated(
                f, kern, window_strides=(16, 16), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision)
            return out.sum()

        @jax.jit
        def chain(frames, kern, steps):
            def body(i, carry):
                return carry + conv(frames, kern, carry * 1e-9)
            return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

        return chain

    gflop = 2 * 512 * 14 * 14 * 16 * 16 * 3 * 768 / 1e9
    for name, precision in [("HIGHEST", jax.lax.Precision.HIGHEST),
                            ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        chain = make(precision)
        sec = sustained_seconds_per_step(
            lambda s, c=chain: c(frames, kern, jnp.int32(s)))
        print(f"{name}: {sec * 1e3:.3f} ms  ({gflop / sec / 1e3:.1f} TFLOP/s)",
              flush=True)


if __name__ == "__main__":
    main()
