#!/usr/bin/env python
"""Single-process A/B of the FiT video-tower eval path: SPLIT-layout vs
JOINT-layout whole-block megakernel, end-to-end through
encode_video_features_fast (patch conv + embed prologue + 12 blocks + final
LN). Interleaved measurement (joint, split, joint, split) so relay-load
drift hits both arms equally. Relay-safe timing per
fitclip_tpu/utils/benchmarking.py. One JSON line per measurement.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.frozen_in_time.encoder import (
        FrozenInTimeConfig, FrozenInTimeVideoTextEncoder)
    from fitclip_tpu.models.frozen_in_time.fit_fast import (
        encode_video_features_fast)
    from fitclip_tpu.ops.quant import apply_act_scales
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    batch = int(os.environ.get("BENCH_CLIPS", "32"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "2"))
    cfg = FrozenInTimeConfig()
    enc = FrozenInTimeVideoTextEncoder(cfg, dtype="int8",
                                       fused_attention=False,
                                       fused_block=False)
    qparams = enc.init_params(jax.random.PRNGKey(0))
    calib_rng = np.random.default_rng(0)
    calib = jnp.asarray(calib_rng.normal(size=(
        8, cfg.num_frames, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    qparams = apply_act_scales(qparams, enc.collect_act_amax(qparams, calib))

    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.normal(size=(
        batch, cfg.num_frames, cfg.img_size, cfg.img_size, 3)
    ).astype(np.float32)).astype(jnp.bfloat16)

    def make_chain(**kw):
        @jax.jit
        def chain(video, steps):
            def body(i, carry):
                v = video * (1.0 + i.astype(video.dtype)
                             * jnp.bfloat16(1e-6))
                emb = encode_video_features_fast(qparams["video"], v, cfg,
                                                 **kw)
                return carry + jnp.sum(emb.astype(jnp.float32))
            return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))
        return chain

    cases = os.environ.get("FIT_AB_CASES", "joint,pad8").split(",")
    # The abl_* arms are the VERDICT r4 #1 attribution set: timing-only
    # kernel variants that passthrough one attention core while keeping the
    # full dense/LN/quant dataflow (ops/fit_block.py _fit_layer_kernel
    # `variant`). full - abl_notime = the time core's e2e cost, etc.
    all_chains = {"joint": lambda: make_chain(),
                  "split": lambda: make_chain(split=True),
                  "pad8": lambda: make_chain(pad8=True),
                  "abl_notime": lambda: make_chain(variant="notime_core"),
                  "abl_nospace": lambda: make_chain(variant="nospace_core"),
                  "abl_noattn": lambda: make_chain(variant="noattn_core"),
                  "abl_nocls": lambda: make_chain(variant="nocls"),
                  "abl_joint1sm": lambda: make_chain(variant="joint1sm"),
                  # timemxu: same math as full, time attention on the MXU
                  # via head-sum/expand selection matmuls (parity-gated in
                  # tests/test_fit_fast.py) — a candidate default, not an
                  # ablation.
                  "timemxu": lambda: make_chain(variant="timemxu"),
                  "pad8_timemxu": lambda: make_chain(pad8=True,
                                                     variant="timemxu"),
                  # clscat restores the pre-round-5 lane-concat CLS join in
                  # the space attention (the old shipped kernel) as the
                  # in-session baseline for the nocat/timemxu wins.
                  "clscat": lambda: make_chain(variant="clscat"),
                  "pad8_clscat": lambda: make_chain(pad8=True,
                                                    variant="clscat"),
                  # Composable round-5 combos ("+"-joined parity-exact
                  # variants, ops/fit_block.py).
                  "pad8_tm_clscat": lambda: make_chain(
                      pad8=True, variant="timemxu+clscat"),
                  "pad8_tm_spacepack": lambda: make_chain(
                      pad8=True, variant="timemxu+spacepack"),
                  "pad8_spacepack": lambda: make_chain(
                      pad8=True, variant="spacepack"),
                  "pad8_tm_sp_clspack": lambda: make_chain(
                      pad8=True, variant="timemxu+spacepack+clspack"),
                  "pad8_tm_spcat_clspack": lambda: make_chain(
                      pad8=True,
                      variant="timemxu+spacepack+spacecat+clspack")}
    chains = {name: all_chains[name]() for name in cases}
    for r in range(rounds):
        for name, chain in chains.items():
            seconds = sustained_seconds_per_step(
                lambda s, c=chain: c(video, jnp.int32(s)))
            print(json.dumps({
                "case": name, "round": r,
                "ms_per_call": round(seconds * 1e3, 2),
                "clips_per_sec": round(batch / seconds, 1),
                "batch_clips": batch}), flush=True)


if __name__ == "__main__":
    main()
