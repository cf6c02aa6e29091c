#!/usr/bin/env python
"""Decompose the Pallas S3DG stem path (ops/s3dg_stem.py) vs the XLA stem.

Cases (each timed with the chained-fori relay-safe harness):
  xla       s2d + conv(2,4,4) + slice + first max pool (the fast-path stem)
  kern      full kernel path: s2d_transpose + pallas conv + pool + transpose
  relayout  s2d_transpose alone (the kernel's XLA-side input relayout)
  kcore     the pallas conv+pool kernel alone on a pre-relayouted input
  xrelay    the XLA path's s2d relayout alone (cast + 8-D transpose)
  xconv     the XLA conv alone on a pre-s2d input (+ slice)

One JSON line per case.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.s3dg import max_pool_3d_tf_padding, space_to_depth
    from fitclip_tpu.models.s3dg_fast import (_folded, _st_conv,
                                              _stem_kernel_path)
    from fitclip_tpu.ops.s3dg_stem import (pack_stem_weights,
                                           pack_stem_weights_v2,
                                           pack_stem_weights_v3,
                                           s2d_transpose, s3dg_stem_conv,
                                           s3dg_stem_conv_v2,
                                           s3dg_stem_conv_v3)
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step
    from tests.test_s3dg_stem import _random_stem_params

    batch = int(os.environ.get("BENCH_CLIPS", "16"))
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.normal(size=(batch, 16, 224, 224, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = jax.device_put(_random_stem_params(rng))
    dtype = jnp.bfloat16

    kern, bias = _folded(params["conv1"]["conv1"], params["conv1"]["bn1"], dtype)
    w2, bias_b, sel = pack_stem_weights(kern, bias, dtype)
    xt = jax.jit(s2d_transpose)(video)
    xs2d = jax.jit(space_to_depth)(video)

    def xla_stem(p, v):
        x = _st_conv(p["conv1"], space_to_depth(v), (2, 4, 4), stride=1,
                     padding=(1, 2, 2), dtype=dtype)[:, 1:, 1:, 1:, :]
        return max_pool_3d_tf_padding(x, (1, 3, 3), (1, 2, 2))

    v2_packs = {r: pack_stem_weights_v2(kern, bias, dtype, rows_per_iter=r)
                for r in (1, 2, 4, 8)}

    def kcore2(x, r):
        w, b, s = v2_packs[r]
        return s3dg_stem_conv_v2(x, w, b, s, ws=112)

    v3_packs = {r: pack_stem_weights_v3(kern, bias, dtype, rows_per_iter=r)
                for r in (2, 4, 8)}

    def kcore3(x, r):
        w, b, s = v3_packs[r]
        return s3dg_stem_conv_v3(x, w, b, s, ws=112)

    cases = {
        "xla": lambda v: xla_stem(params, v),
        "kcore2_r1": lambda x: kcore2(x, 1),
        "kcore2_r2": lambda x: kcore2(x, 2),
        "kcore2_r4": lambda x: kcore2(x, 4),
        "kcore2_r8": lambda x: kcore2(x, 8),
        "kcore3_r2": lambda x: kcore3(x, 2),
        "kcore3_r4": lambda x: kcore3(x, 4),
        "kcore3_r8": lambda x: kcore3(x, 8),
        "kern": lambda v: _stem_kernel_path(params, v, dtype),
        "relayout": s2d_transpose,
        "kcore": lambda x: s3dg_stem_conv(x, w2, bias_b, sel, ws=112),
        "xrelay": space_to_depth,
        "xconv": lambda x: _st_conv(params["conv1"], x, (2, 4, 4), stride=1,
                                    padding=(1, 2, 2),
                                    dtype=dtype)[:, 1:, 1:, 1:, :],
    }
    inputs = {"xla": video, "kern": video, "relayout": video,
              "kcore": xt, "xrelay": video, "xconv": xs2d,
              "kcore2_r1": xt, "kcore2_r2": xt, "kcore2_r4": xt,
              "kcore2_r8": xt, "kcore3_r2": xt, "kcore3_r4": xt,
              "kcore3_r8": xt}

    selected = sys.argv[1:] or list(cases)
    for name in selected:
        fn, arg = cases[name], inputs[name]

        @jax.jit
        def chain(v, steps, fn=fn):
            def body(i, carry):
                vv = v * (1.0 + carry.astype(v.dtype) * jnp.asarray(1e-6, v.dtype))
                out = fn(vv)
                return carry + (jnp.abs(out.astype(jnp.float32)).sum() > 0
                                ).astype(jnp.int32)
            return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

        sec = sustained_seconds_per_step(lambda s: chain(arg, jnp.int32(s)))
        print(json.dumps({"case": name, "ms": round(sec * 1e3, 3),
                          "clips_per_s": round(batch / sec, 1)}), flush=True)


if __name__ == "__main__":
    main()
