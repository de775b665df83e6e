"""Attribute the FastViT-T8 train-step time to its parts by ablation.

Times the production train step with components removed (depths zeroed,
stem-only, heads-only via identity-ish configs) so the fused-stage-kernel
candidate (ROADMAP #0) gets a measured ceiling instead of a guess. Each
variant is the same jit_train_step the bench uses; differences of means
attribute cost. Synthetic shapes, one chip.

Usage: python scripts/probe_fastvit_stages.py [steps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp


def time_variant(name: str, depths, steps: int, bs: int, size: int) -> float:
    """Build t8 with overridden stage depths and time the production step."""
    import dataclasses

    from bench import synthetic_batch

    from dino_pose_tpu.core.precision import policy_for_backend
    from dino_pose_tpu.models import fastvit, registry
    from dino_pose_tpu.train.state import create_train_state
    from dino_pose_tpu.train.step import jit_train_step

    orig = fastvit.FASTVIT_PRESETS["t8"]
    fastvit.FASTVIT_PRESETS["t8"] = dataclasses.replace(orig, depths=tuple(depths))
    try:
        config = {
            "model_name": "timm/fastvit_t8.apple_in1k",
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
        for _ in range(3):
            state, _ = step(state, batch, lr, key)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, _ = step(state, batch, lr, key)
        jax.block_until_ready(state)
        ms = (time.perf_counter() - t0) / steps * 1000
        print(f"{name:28s} depths={tuple(depths)}  {ms:7.2f} ms/step", flush=True)
        return ms
    finally:
        fastvit.FASTVIT_PRESETS["t8"] = orig


def main() -> None:
    from dino_pose_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    bs, size = 128, 256
    full = time_variant("full t8", (2, 2, 4, 2), steps, bs, size)
    none = time_variant("no blocks (stem+PE+heads)", (0, 0, 0, 0), steps, bs, size)
    s0 = time_variant("stage0 only", (2, 0, 0, 0), steps, bs, size)
    s1 = time_variant("stage1 only", (0, 2, 0, 0), steps, bs, size)
    s2 = time_variant("stage2 only", (0, 0, 4, 0), steps, bs, size)
    s3 = time_variant("stage3 only", (0, 0, 0, 2), steps, bs, size)
    print("\nattribution (ms/step):")
    print(f"  all blocks            : {full - none:7.2f}")
    print(f"  stage0 blocks (2@64^2): {s0 - none:7.2f}")
    print(f"  stage1 blocks (2@32^2): {s1 - none:7.2f}")
    print(f"  stage2 blocks (4@16^2): {s2 - none:7.2f}")
    print(f"  stage3 blocks (2@8^2) : {s3 - none:7.2f}")
    print(f"  stem+PE+final+heads   : {none:7.2f}")


if __name__ == "__main__":
    main()
