#!/usr/bin/env python
"""A/B the Flax S3DG eval forward vs the restructured fast-eval forward
(models/s3dg_fast.py: folded BN, merged 1x1 branch convs, single gating
multiply). Checks per-clip embedding cosine before timing.

Usage: python scripts/bench_s3dg_fast.py [flax|fast ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.s3dg import S3DG
    from fitclip_tpu.models.s3dg_fast import s3dg_fast_apply
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    batch = int(os.environ.get("BENCH_CLIPS", "16"))
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.normal(size=(batch, 16, 224, 224, 3)).astype(np.float32))
    model = S3DG(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 32, 32, 3)))["params"]
    # Randomize the BN running stats so the fold is actually exercised.
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = getattr(path[-1], "key", "")
        if name == "running_mean":
            leaf = jnp.asarray((rng.normal(size=leaf.shape) * 0.1).astype(np.float32))
        elif name == "running_var":
            leaf = jnp.asarray((1.0 + rng.random(leaf.shape) * 0.5).astype(np.float32))
        out.append(leaf)
    params = jax.device_put(jax.tree_util.tree_unflatten(treedef, out))

    cases = {"flax": lambda p, v: model.apply({"params": p}, v),
             "fast": lambda p, v: s3dg_fast_apply(p, v, stem_kernel=False),
             "stem": lambda p, v: s3dg_fast_apply(p, v, stem_kernel=True)}
    selected = sys.argv[1:] or list(cases)

    for name in [n for n in ("fast", "stem") if n in selected and "flax" in selected]:
        a = np.asarray(jax.jit(cases["flax"])(params, video), np.float32)
        b = np.asarray(jax.jit(cases[name])(params, video), np.float32)
        cos = ((a * b).sum(-1) /
               (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9))
        print(json.dumps({"check": f"{name}_vs_flax",
                          "min_cosine": round(float(cos.min()), 6)}), flush=True)
        assert cos.min() > 0.999, cos.min()

    for name in selected:
        fn = cases[name]

        @jax.jit
        def chain(p, v, steps, fn=fn):
            def body(i, carry):
                vv = v * (1.0 + carry.astype(jnp.float32) * 1e-6)
                e = fn(p, vv)
                return carry + (jnp.abs(e).sum() > 0).astype(jnp.int32)
            return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

        sec = sustained_seconds_per_step(
            lambda s: chain(params, video, jnp.int32(s)))
        print(json.dumps({"case": name, "ms": round(sec * 1e3, 2),
                          "clips_per_s": round(batch / sec, 1)}), flush=True)


if __name__ == "__main__":
    main()
