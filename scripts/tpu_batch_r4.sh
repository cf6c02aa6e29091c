#!/bin/bash
# Round-4 TPU measurement batch (one v5e chip via the async relay).
# Run ONLY while the CPU test suite is NOT running (host contention).
# Appends one section per experiment to $OUT; every bench prints JSON lines
# through the relay-safe timing in fitclip_tpu/utils/benchmarking.py.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-.diag/tpu_batch_r4.log}
mkdir -p .diag

run() {
    local name="$1"; shift
    echo "=== $name : $* ($(date -u +%H:%M:%SZ)) ===" >> "$OUT"
    timeout "${STEP_TIMEOUT:-2400}" "$@" >> "$OUT" 2>&1
    echo "--- rc=$? ---" >> "$OUT"
}

# 1. Headline gate after the ops/block.py seq_valid threading (must hold).
run headline python bench.py

# 2. VideoCLIP bf16 fusion tower (round-4 change; was 731 with fp32 fusion).
run videoclip_bf16 python scripts/bench_families.py videoclip

# 3. S3DG int8 (VERDICT r3 #4): MIL-NCE target >=2000, VideoCLIP follows.
run milnce_int8 python scripts/bench_families.py mil_nce_s3dg_int8
run videoclip_int8 python scripts/bench_families.py videoclip_int8

# 4. FiT pad8 vs joint (VERDICT r3 #2 alignment-tax experiment):
#    per-layer standalone first, then end-to-end.
run fit_pad8_layer python scripts/bench_fit_block.py full pad8 full pad8
run fit_pad8 env FIT_AB_CASES=joint,pad8 python scripts/bench_fit_e2e_ab.py

# 5. FiT int8 batch sweep (only bf16 b64 was on record).
run fit_b64 env BENCH_CLIPS=64 FIT_AB_CASES=joint python scripts/bench_fit_e2e_ab.py
run fit_b128 env BENCH_CLIPS=128 FIT_AB_CASES=joint python scripts/bench_fit_e2e_ab.py

# 6. ViT-L/14@336px lane pad (VERDICT r3 #5): unpadded vs CLIP_PAD_SEQ=640.
run vitl336_base env BENCH_IMAGE_SIZE=336 python scripts/bench_vitl_throughput.py
run vitl336_pad640 env BENCH_IMAGE_SIZE=336 CLIP_PAD_SEQ=640 python scripts/bench_vitl_throughput.py

# 7. Post-defer-gating S3DG decomposition trace (VERDICT r3 #4 'publish').
run s3dg_profile python scripts/profile_s3dg.py

# 8. FiT int8 export smoke on-chip (VERDICT r3 #6).
run fit_export env CHECK_EXPORT_FAMILY=fit python scripts/check_export_int8.py

echo "BATCH DONE $(date -u +%H:%M:%SZ)" >> "$OUT"
