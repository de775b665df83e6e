#!/bin/bash
# Final FastViT train-math combination: reuse blocks + branch FFN (the
# r4d grid showed FFN folds cost ~4% in train — frozen fc1 + folded
# batch-stat affine forces a weight-grad matmul in backward — while reuse
# blocks gain ~3% over branch blocks). Interleaved with the pure-branch
# control, twice each.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r4}
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: $* (started $(date +%H:%M:%S))"
  timeout 900 "$@" 2>"$OUT/$name.err" | tail -1 | tee "$OUT/$name.json"
  echo "=== $name done rc=$? ($(date +%H:%M:%S))"
}

for i in 1 2; do
  run "e${i}_reuse_ffnbranch" env DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS=reuse DINO_POSE_TPU_FASTVIT_TRAIN_FFN=branch \
    python bench.py --model timm/fastvit_t8.apple_in1k
  run "e${i}_branch" env DINO_POSE_TPU_FASTVIT_FOLD=0 \
    python bench.py --model timm/fastvit_t8.apple_in1k
  run "e${i}_branch_ffnbranch" env DINO_POSE_TPU_FASTVIT_TRAIN_FFN=branch \
    python bench.py --model timm/fastvit_t8.apple_in1k
done

echo "All done:"
grep -h '"value"' "$OUT"/e?_*.json
