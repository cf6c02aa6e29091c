#!/usr/bin/env python
"""Single-process interleaved A/B of the S3DG fast-eval forward over the
round-5 restructuring knobs (S3DG_GATEMM / S3DG_MEANMM / S3DG_FOLD2B,
models/s3dg_fast.py). Sequential per-process family benches showed ±2-4%
cross-session drift — larger than the knob deltas — so, exactly like the
FiT attribution (bench_fit_e2e_ab.py), the arms here trace in ONE process
(the knobs are read at trace time; the env flips between traces) and
measure in interleaved rounds. Relay-safe timing. One JSON line per
measurement. S3DG_AB_CASES picks arms from: r4, fold, gatemm, meanmm,
gatemm_fold, all.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KNOBS = {
    "r4": dict(S3DG_GATEMM="0", S3DG_MEANMM="0", S3DG_FOLD2B="0"),
    "fold": dict(S3DG_GATEMM="0", S3DG_MEANMM="0", S3DG_FOLD2B="1"),
    "gatemm": dict(S3DG_GATEMM="1", S3DG_MEANMM="0", S3DG_FOLD2B="0"),
    "meanmm": dict(S3DG_GATEMM="0", S3DG_MEANMM="1", S3DG_FOLD2B="0"),
    "gatemm_fold": dict(S3DG_GATEMM="1", S3DG_MEANMM="0", S3DG_FOLD2B="1"),
    "all": dict(S3DG_GATEMM="1", S3DG_MEANMM="1", S3DG_FOLD2B="1"),
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.mil_nce import MilNceVideoTextEncoder
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    batch = int(os.environ.get("BENCH_CLIPS", "16"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "2"))
    cases = os.environ.get(
        "S3DG_AB_CASES", "r4,fold,gatemm,gatemm_fold,all").split(",")

    encoder = MilNceVideoTextEncoder(dtype=jnp.bfloat16)
    spec = encoder.preprocess
    frames = spec.pad_to_min_frames or spec.num_frames
    size = spec.image_size
    params = jax.device_put(encoder.init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(
        size=(batch, frames, size, size, 3)).astype(np.float32))

    chains = {}
    for name in cases:
        os.environ.update(KNOBS[name])

        @jax.jit
        def chain(params, video, steps):
            def body(i, carry):
                v = video * (1.0 + carry.astype(jnp.float32) * 1e-6)
                emb = encoder.encode_video(params, v)
                return carry + (jnp.abs(emb).sum() > 0).astype(jnp.int32)
            return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

        # Trace NOW (the knobs are read inside this trace), before the env
        # moves on to the next arm.
        chains[name] = chain.lower(params, video, jnp.int32(1)).compile()

    for r in range(rounds):
        for name, compiled in chains.items():
            seconds = sustained_seconds_per_step(
                lambda s, c=compiled: c(params, video, jnp.int32(s)))
            print(json.dumps({
                "case": name, "round": r,
                "ms_per_call": round(seconds * 1e3, 2),
                "clips_per_sec": round(batch / seconds, 1),
                "batch_clips": batch}), flush=True)


if __name__ == "__main__":
    main()
