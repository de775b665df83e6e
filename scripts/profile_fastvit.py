"""Profile one FastViT-T8 train step on the TPU and summarise the device trace.

VERDICT r2 #4: decide with a trace whether the conv-heavy RepMixer/ConvFFN
path needs hand-written kernels or XLA is already at the roofline. Mirrors
the round-2 dinov2 trace methodology (PERFORMANCE.md "Device trace" section):
capture ``jax.profiler`` trace around a few compiled production steps
(the same program ``bench.py --mode train`` times), then aggregate the
device-track op durations from the trace-event JSON.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_fastvit.py
  [steps]   (env: MODEL=timm/fastvit_t8.apple_in1k BS=128 IMG=256)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def summarize(logdir: str, steps: int) -> None:
    paths = glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", logdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid
        for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "XLA" in name
    }
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_op[name] += dur
        total += dur
    print(f"device pids: { {p: pid_names[p] for p in device_pids} }")
    print(f"total device time: {total:.2f} ms over {steps} steps "
          f"= {total / max(steps, 1):.2f} ms/step")
    print("top ops (per step):")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:35]:
        print(f"  {ms / max(steps, 1):7.3f} ms  {name[:110]}")


def main() -> None:
    import numpy as np  # noqa: F401

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synthetic_batch

    from dino_pose_tpu.core.precision import policy_for_backend
    from dino_pose_tpu.models import registry
    from dino_pose_tpu.train.state import create_train_state
    from dino_pose_tpu.train.step import jit_train_step
    from dino_pose_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    bs = int(os.environ.get("BS", "128"))
    size = int(os.environ.get("IMG", "256"))
    model_name = os.environ.get("MODEL", "timm/fastvit_t8.apple_in1k")

    config = {
        "model_name": model_name,
        "num_keypoints": 24,
        "output_heatmap_size": 48,
        "unfreeze_last_n_layers": 4,
        "use_lora": True,
        "lora_rank": 8,
        "lora_alpha": 16,
        "lora_dropout": 0.1,
    }
    model = registry.create_model_from_config(config, pretrained=False)
    state, tx, part = create_train_state(model.variables, config, model.family)
    compute_dtype = policy_for_backend(jax.default_backend()).compute_dtype
    step = jit_train_step(
        model.module, tx, part,
        device_targets=(size, 48), compute_dtype=compute_dtype,
    )
    batch = synthetic_batch(bs, np.float32, size)
    del batch["2d_heatmaps"]
    batch = jax.device_put(batch)
    lr = jnp.float32(3e-5)
    key = jax.random.key(0)

    for _ in range(3):  # warmup/compile
        state, stats = step(state, batch, lr, key)
    jax.block_until_ready(state)

    logdir = os.environ.get("TRACE_DIR", "/tmp/fastvit_trace")
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        state, stats = step(state, batch, lr, key)
    jax.block_until_ready(state)
    jax.profiler.stop_trace()
    print("loss:", float(stats["loss"]))
    summarize(logdir, steps)


if __name__ == "__main__":
    main()
