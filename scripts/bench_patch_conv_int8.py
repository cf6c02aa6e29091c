#!/usr/bin/env python
"""Probe: does XLA:TPU run the patch-embedding conv on the int8 MXU?

The eval input is uint8 pixels (pixel normalization folded into the patch
weights), so the activation side of an int8 patch conv is EXACT: x-128 fits
int8 with zero quantization error. Weights take the usual per-channel int8
grid. If the lowering is real (not an upconvert fallback) this halves the
~1.3 ms bf16 conv."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    rng = np.random.default_rng(0)
    frames_u8 = rng.integers(0, 256, size=(512, 224, 224, 3), dtype=np.uint8)
    frames_i8 = jnp.asarray(frames_u8.astype(np.int16) - 128, jnp.int8)
    kern_i8 = jnp.asarray(rng.integers(-127, 128, size=(16, 16, 3, 768),
                                       dtype=np.int64), jnp.int8)

    def conv(f, k, bump):
        out = jax.lax.conv_general_dilated(
            (f + bump).astype(jnp.int8), k, window_strides=(16, 16),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return out.sum()

    @jax.jit
    def chain(f, k, steps):
        def body(i, carry):
            return carry + conv(f, k, (carry % 2).astype(jnp.int8))
        return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

    gflop = 2 * 512 * 14 * 14 * 16 * 16 * 3 * 768 / 1e9
    sec = sustained_seconds_per_step(
        lambda s: chain(frames_i8, kern_i8, jnp.int32(s)))
    print(f"int8 conv: {sec * 1e3:.3f} ms  ({gflop / sec / 1e3:.1f} TOPS)",
          flush=True)


if __name__ == "__main__":
    main()
