#!/usr/bin/env python
"""A/B formulations of the S3DG stem-kernel input relayout (s2d_transpose).

The direct 8-D transpose writes 118 MB in ~3.0 ms (~60 GB/s effective,
scripts/bench_s3dg_stem3.py) because the source layout interleaves the
(w2, c) channels at stride 6 bytes along the raw (224, 3)-trailing dims.
Candidates, all numerics-checked against the shipped s2d_transpose:

  base     the shipped 8-D transpose + pad
  parity   two-stage: (B,T,2,112,672) parity transpose first (1344-byte
           contiguous chunks), then the per-parity de-interleave
  selmm    stride-6 de-interleave as ONE selection MATMUL on the MXU:
           (B*T*224, 672) @ Sel (672, 768) with Sel[6w+j, 128j+w]=1, then
           an assembly transpose whose minor dim is a contiguous 128-lane
           chunk (bandwidth-bound instead of gather-bound)

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

    from fitclip_tpu.ops.s3dg_stem import _C_PAD, s2d_transpose
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    batch = int(os.environ.get("BENCH_CLIPS", "16"))
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.normal(size=(batch, 16, 224, 224, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def parity(x):
        b, t, h, w, c = x.shape
        x = x.reshape(b, t // 2, 2, h // 2, 2, w * c)
        x = x.transpose(0, 1, 3, 2, 4, 5)      # (B, Ts, Hs, t2, h2, W*C)
        x = x.reshape(b, t // 2, h // 2, 4, w // 2, 2 * c)
        x = x.transpose(0, 1, 2, 3, 5, 4)      # (B, Ts, Hs, th2, (w2 c), Ws)
        x = x.reshape(b, t // 2, h // 2, 8 * c, w // 2)
        return jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, _C_PAD - 8 * c),
                           (0, 128 - w // 2)))

    def selmm(x):
        b, t, h, w, c = x.shape
        ws = w // 2
        # Sel[6*wo + j, 128*j + wo] = 1 for wo < ws, j = 3*w2 + c < 6
        # (raw lane 3*(2*wo + w2) + c = 6*wo + j).
        j = np.arange(6).repeat(ws)
        wo = np.tile(np.arange(ws), 6)
        sel = np.zeros((w * c, 6 * 128), np.float32)
        sel[6 * wo + j, 128 * j + wo] = 1.0
        sel = jnp.asarray(sel, jnp.bfloat16)
        rows = x.reshape(b, t, h, w * c)
        p = jax.lax.dot_general(rows, sel, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = p.astype(x.dtype).reshape(b, t // 2, 2, h // 2, 2, 6, 128)
        # -> (B, Ts, Hs, t2, h2, j, 128): minor dim stays a contiguous
        # 128-lane chunk through the transpose.
        p = p.transpose(0, 1, 3, 2, 4, 5, 6)
        p = p.reshape(b, t // 2, h // 2, 8 * c, 128)
        return jnp.pad(p, ((0, 0), (0, 1), (0, 0), (0, _C_PAD - 8 * c),
                           (0, 0)))

    def base(x):
        b, t, h, w, c = x.shape
        x = x.reshape(b, t // 2, 2, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 6, 7, 5)
        x = x.reshape(b, t // 2, h // 2, 8 * c, w // 2)
        return jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, _C_PAD - 8 * c),
                           (0, 128 - w // 2)))

    cases = {"base": base, "parity": parity, "selmm": selmm,
             "shipped": s2d_transpose}
    selected = sys.argv[1:] or list(cases)

    ref = np.asarray(jax.jit(base)(video), np.float32)
    for name in selected:
        got = np.asarray(jax.jit(cases[name])(video), np.float32)
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        np.testing.assert_array_equal(got, ref, err_msg=name)

    for name in selected:
        fn = cases[name]

        @jax.jit
        def chain(v, steps, fn=fn):
            def body(i, carry):
                vv = v * (1.0 + carry.astype(v.dtype) * jnp.asarray(1e-6, v.dtype))
                out = fn(vv)
                return carry + (jnp.abs(out.astype(jnp.float32)).sum() > 0
                                ).astype(jnp.int32)
            return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

        sec = sustained_seconds_per_step(lambda s: chain(video, jnp.int32(s)))
        print(json.dumps({"case": name, "ms": round(sec * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
