#!/bin/bash
# Round-4 hardware re-capture session (run ONE process at a time — the axon
# tunnel serves a single chip and parallel processes poison it).
#
# Run when the tunnel is live:  bash scripts/tpu_session_r4.sh
# Results accumulate in /tmp/tpu_r4/ as one JSON line per bench.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r4}
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: $* (started $(date +%H:%M:%S))"
  timeout 3600 "$@" 2>"$OUT/$name.err" | tail -1 | tee "$OUT/$name.json"
  echo "=== $name done rc=$? ($(date +%H:%M:%S))"
}

# 1. Driver headline: flagship LoRA fine-tune (expect ~4325 img/s/chip).
run flagship python bench.py

# 2. Unfreeze-last-4 (expect ~2938).
run unfreeze4 python bench.py --no-lora

# 3. FastViT t8 fold A/B (r3 committed the train-time reparam fold with no
#    hardware number; branch-form baseline was 1928 img/s).
run fvt_fold0 env DINO_POSE_TPU_FASTVIT_FOLD=0 python bench.py --model timm/fastvit_t8.apple_in1k
run fvt_fold1 env DINO_POSE_TPU_FASTVIT_FOLD=1 python bench.py --model timm/fastvit_t8.apple_in1k

# 4. Trainable big-D with the round-4 full streaming backward
#    (previously fell to unfused XLA; base all-XLA r2 point: 1370 img/s).
run base_unfreeze python bench.py --model facebook/dinov2-base --no-lora --batch-size 64
run large_unfreeze python bench.py --model facebook/dinov2-large --no-lora --batch-size 32

# 5. Frozen/LoRA big-D regression checks (r3: base 1783, large 652).
run base_lora python bench.py --model facebook/dinov2-base --batch-size 64
run large_lora python bench.py --model facebook/dinov2-large --batch-size 32

# 6. SA/MA variants (first hardware rows; registry promises all five).
run sa12_train python bench.py --model timm/fastvit_sa12.apple_in1k --batch-size 64
run sa12_infer python bench.py --mode infer --model timm/fastvit_sa12.apple_in1k
run ma36_infer python bench.py --mode infer --model timm/fastvit_ma36.apple_in1k

echo "All done. JSON lines in $OUT/:"
grep -h . "$OUT"/*.json
