#!/usr/bin/env bash
# Sweep every saved training checkpoint through a WiSE-FT ensemble evaluation
# across four benchmarks (the reference's per-epoch eval loop,
# scripts/evaluate_per_epoch.sh). Configure with:
#   CKPT_GLOB    glob of checkpoints to evaluate (orbax dirs or .ckpt files)
#   WISE_WEIGHT  ensemble weight for the fine-tuned model (default 0.4)
#   BENCHMARKS   comma-separated data configs
#   FRAME_CACHE  optional dir: decoded eval frames cache — every checkpoint
#                after the first skips decode+transform entirely
set -euo pipefail
set -x

CKPT_GLOB=${CKPT_GLOB:-checkpoints/epoch_*}
WISE_WEIGHT=${WISE_WEIGHT:-0.4}
BENCHMARKS=${BENCHMARKS:-moments_in_time,msrvtt,webvid,youcook2}
CACHE_OVERRIDE=()
if [[ -n "${FRAME_CACHE:-}" ]]; then
  CACHE_OVERRIDE=("++data.eval_frame_cache_dir=${FRAME_CACHE}")
fi
PREPARED=$(mktemp --suffix=.pt)

for ckpt in $CKPT_GLOB; do
  # Export an eval-ready CLIP state dict (re-injects the NaN logit_scale).
  ./scripts/prepare_trained_clip_checkpoint_for_evaluation.py "$ckpt" "$PREPARED"

  # WiSE-FT: pretrained zero-shot model blended with the fine-tuned student.
  python -m aligner --multirun \
    command=evaluate \
    encoder=wise \
    "++encoder.model1={}" \
    +encoder@encoder.model1=clip_vit_b_16 \
    "++encoder.model2={}" \
    +encoder@encoder.model2=clip_from_pretrained \
    +encoder.model2.checkpoint_path="$PREPARED" \
    ++encoder.weight_for_2="$WISE_WEIGHT" \
    data="$BENCHMARKS" \
    "${CACHE_OVERRIDE[@]}" \
    silent=true
done

rm -f "$PREPARED"
