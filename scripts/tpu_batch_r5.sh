#!/bin/bash
# Round-5 TPU measurement batch (one v5e chip via the async relay).
# Run ONLY while the CPU test suite is NOT running (host contention).
# Appends one section per experiment to $OUT; every bench prints JSON lines
# through the relay-safe timing in fitclip_tpu/utils/benchmarking.py.
#
# The FiT attribution arms + lever A/Bs (VERDICT r4 #1) run separately via
# scripts/bench_fit_e2e_ab.py FIT_AB_CASES (see BASELINE.md round-5 tables).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-.diag/tpu_batch_r5.log}
mkdir -p .diag

run() {
    local name="$1"; shift
    echo "=== $name : $* ($(date -u +%H:%M:%SZ)) ===" >> "$OUT"
    timeout "${STEP_TIMEOUT:-2400}" "$@" >> "$OUT" 2>&1
    echo "--- rc=$? ---" >> "$OUT"
}

# 1. S3DG after the single-reduce gating (VERDICT r4 #2a): fresh trace +
#    family rates (MIL-NCE target >=1900, VideoCLIP follows).
run s3dg_profile python scripts/profile_s3dg.py
run milnce python scripts/bench_families.py mil_nce_s3dg
run videoclip python scripts/bench_families.py videoclip

# 2. FiT family re-gate with the round-5 kernel (nocat CLS join and, if the
#    lever A/B picked it, FIT_VARIANT=timemxu) — cosine gate runs before
#    timing inside bench_families.
run fit python scripts/bench_families.py frozen_in_time_int8

# 3. AdamW bf16 moments (VERDICT r4 #4): same-session A/B.
run train_moments python scripts/bench_train.py --remat --remat-policy dots --batch 16 --cases contrastive,contrastive_bf16m

# 4. Headline re-gate (must hold after the fit_block edits; CLIP shares
#    ops/block.py but not ops/fit_block.py — expect no change).
run headline python bench.py

echo "BATCH DONE $(date -u +%H:%M:%SZ)" >> "$OUT"
