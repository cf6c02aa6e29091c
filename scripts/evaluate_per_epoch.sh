#!/usr/bin/env bash
# For each epoch checkpoint: prepare an eval state dict, then multirun a
# WiSE-FT ensemble eval across benchmarks (reference scripts/evaluate_per_epoch.sh).
set -x

CKPT_GLOB=${CKPT_GLOB:-checkpoints/epoch_*}

for file in $CKPT_GLOB; do
  ./scripts/prepare_trained_clip_checkpoint_for_evaluation.py "$file" a.pt
  python -m aligner \
    --multirun \
    command=evaluate \
    encoder=wise \
    "++encoder.model1={}" \
    +encoder@encoder.model1=clip_vit_b_16 \
    "++encoder.model2={}" \
    +encoder@encoder.model2=clip_from_pretrained \
    +encoder.model2.checkpoint_path="$PWD"/a.pt \
    ++encoder.weight_for_2=0.4 \
    data=moments_in_time,msrvtt,webvid,youcook2 \
    silent=true
done
