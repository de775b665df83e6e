#!/bin/bash
# Round-4 follow-up A/Bs (after tpu_session_r4b.sh):
#   - isolate the train-time branch-output REUSE gain from the plain fold
#     (fvt_fold1 in r4b measured fold+reuse, the new default)
#   - prove the round-4 full streaming backward beats unfused XLA on
#     trainable big-D blocks (VERDICT r3 next #5 "Done =" criterion)
# Run ONE process at a time.
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

# Fold WITHOUT reuse: the middle point of the branch/fold/reuse A/B/C.
# (Historical note: this originally ran with the pre-refactor env pair
# FOLD=1 REUSE=0; TRAIN_BLOCKS=fold is the equivalent arrangement.)
run fvt_foldonly env DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS=fold \
  python bench.py --model timm/fastvit_t8.apple_in1k --image-size 256

# Streaming-backward win over unfused XLA on trainable big-D.
run large_unfreeze_xla env DINO_POSE_TPU_BLOCK=unfused \
  python bench.py --model facebook/dinov2-large --no-lora --batch-size 32
run base_unfreeze_xla env DINO_POSE_TPU_BLOCK=unfused \
  python bench.py --model facebook/dinov2-base --no-lora --batch-size 64

echo "All done:"
grep -h . "$OUT"/fvt_foldonly.json "$OUT"/large_unfreeze_xla.json "$OUT"/base_unfreeze_xla.json
