#!/bin/bash
# Round-5 evidence session: SA/MA train rows (r4 verdict weak #2), on-device
# inference latency per model (weak #3), compare table support. Run on the
# real TPU, one job at a time (the chip is shared).
set -x
cd "$(dirname "$0")/.."

# Train rows for every FastViT registry variant that lacked one (bs=64 —
# the sa12 row convention from round 4).
for V in ma36 sa24 sa36; do
  python scripts/ab_train_step.py X=- --model "timm/fastvit_${V}.apple_in1k" \
    --bs 64 --steps 20 --reps 2
done

# On-device single-image latency (chained-forward device time + tunnel p50)
# for the production models.
for M in facebook/dinov2-small facebook/dinov2-base timm/fastvit_t8.apple_in1k \
         timm/fastvit_sa12.apple_in1k timm/fastvit_ma36.apple_in1k; do
  python bench.py --mode infer --model "$M"
done
