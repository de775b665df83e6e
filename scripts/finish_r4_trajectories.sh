#!/bin/bash
# Finish the round-4 accuracy-trajectory captures that the 529-killed session
# left incomplete: (1) the dinov2 200-epoch run trained to completion but died
# before the final full-metric pass wrote trajectory.json; (2) the FastViT
# re-validation under the new branch-output-reuse default never started.
# One TPU process at a time.
set -u
cd /root/repo

python - <<'EOF'
import json, os, sys
sys.path.insert(0, '/root/repo')
import numpy as np

out = 'docs/accuracy_r4'
ckpt_dir = os.path.join(out, 'ckpt')
data_dir = os.path.join(out, 'data')

from dino_pose_tpu.io import checkpoint as ck
from dino_pose_tpu.train.evaluate import compute_pckh_dataset

model = ck.load_model_smart(os.path.join(ckpt_dir, 'final_model.msgpack'))
full = compute_pckh_dataset(
    model, os.path.join(data_dir, 'images'), os.path.join(data_dir, 'ann.json'),
    return_all=True,
)

# Reconstruct the loss history from the loop's metrics.csv (the in-memory
# `history` died with the launching shell).
train_loss, val_loss = [], []
import csv
with open(os.path.join(ckpt_dir, 'metrics.csv')) as f:
    for row in csv.DictReader(f):
        train_loss.append(float(row['train_loss']))
        val_loss.append(float(row['val_loss']))

record = {
    'final_metrics': {k: float(v) for k, v in full.items()},
    'train_loss': train_loss,
    'val_loss': val_loss,
    'config': {'model': 'facebook/dinov2-small', 'lora': True, 'epochs': 200,
               'batch_size': 32, 'lr': 0.001, 'n_images': 64},
    'note': 'final-metric pass re-run after the training process was killed '
            'post-final_model save; losses reconstructed from metrics.csv',
}
with open(os.path.join(out, 'trajectory.json'), 'w') as f:
    json.dump(record, f, indent=1)
print('FINAL:', json.dumps(record['final_metrics']))
EOF
echo "=== dinov2 final pass rc=$?"

timeout 3600 python scripts/accuracy_trajectory.py \
  --model timm/fastvit_t8.apple_in1k --epochs 150 --out docs/accuracy_r4_fvt \
  2>/tmp/traj_r4_fvt.err | tail -5
echo "=== fastvit 150ep done rc=$?"
