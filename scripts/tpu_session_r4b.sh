#!/bin/bash
# Continuation of the round-4 re-capture (tpu_session_r4.sh): the first
# session captured flagship + unfreeze4; the FastViT runs needed
# --image-size 256 (224/32 = 7x7 violates the hourglass grid constraint)
# and fvt_fold0 hit a transient remote-compile 500 right after the tunnel
# came back. Run ONE process at a time.
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

# 4. Trainable big-D with the round-4 full streaming backward.
run base_unfreeze python bench.py --model facebook/dinov2-base --no-lora --batch-size 64
run large_unfreeze python bench.py --model facebook/dinov2-large --no-lora --batch-size 32

# 5. Frozen/LoRA big-D regression checks (r3: base 1783, large 652).
run base_lora python bench.py --model facebook/dinov2-base --batch-size 64
run large_lora python bench.py --model facebook/dinov2-large --batch-size 32

# 3. FastViT t8 fold A/B at the family's native 256 input.
run fvt_fold0 env DINO_POSE_TPU_FASTVIT_FOLD=0 python bench.py --model timm/fastvit_t8.apple_in1k --image-size 256
run fvt_fold1 env DINO_POSE_TPU_FASTVIT_FOLD=1 python bench.py --model timm/fastvit_t8.apple_in1k --image-size 256

# 6. SA/MA variants (first hardware rows).
run sa12_train python bench.py --model timm/fastvit_sa12.apple_in1k --batch-size 64 --image-size 256
run sa12_infer python bench.py --mode infer --model timm/fastvit_sa12.apple_in1k --image-size 256
run ma36_infer python bench.py --mode infer --model timm/fastvit_ma36.apple_in1k --image-size 256

echo "All done. JSON lines in $OUT/:"
grep -h . "$OUT"/*.json
