#!/bin/bash
# Interleaved repeated A/B of the FastViT train-time math arrangements —
# single runs differ by only a few percent, which is within tunnel drift,
# so each config is measured twice in ABCD ABCD order:
#   A pure branch math          (FOLD=0)
#   B branch blocks + FFN folds (default)
#   C reuse blocks + FFN folds  (TRAIN_BLOCKS=reuse)
#   D fold blocks + FFN folds   (TRAIN_BLOCKS=fold)
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
  run "ab${i}_branch"  env DINO_POSE_TPU_FASTVIT_FOLD=0 python bench.py --model timm/fastvit_t8.apple_in1k
  run "ab${i}_default" python bench.py --model timm/fastvit_t8.apple_in1k
  run "ab${i}_reuse"   env DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS=reuse python bench.py --model timm/fastvit_t8.apple_in1k
  run "ab${i}_fold"    env DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS=fold python bench.py --model timm/fastvit_t8.apple_in1k
done

echo "All done:"
grep -h '"value"' "$OUT"/ab*.json
