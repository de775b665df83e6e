"""Interleaved A/B of the production train step across env-gated kernel modes.

Each arm traces its own jit_train_step under the requested env setting (the
dispatch gates read the env at trace time), then the arms are timed in
interleaved repeats so tunnel-session drift cannot masquerade as a win
(the round-4 fold A/B lesson).

Usage:
  python scripts/ab_train_step.py VAR=a VAR=b [--model timm/fastvit_t8...]
      [--steps 30] [--reps 3] [--bs 128] [--size 256]

Each positional arg is one arm: ``ENVVAR=value`` (value '-' unsets).
"""

from __future__ import annotations

import argparse
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


def build_step(model_name: str, bs: int, size: int):
    from bench import synthetic_batch

    from dino_pose_tpu.core.precision import policy_for_backend
    from dino_pose_tpu.models import registry
    from dino_pose_tpu.train.state import create_train_state
    from dino_pose_tpu.train.step import jit_train_step

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
    batch.pop("2d_heatmaps", None)
    batch = jax.device_put(batch)
    return step, state, batch


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("arms", nargs="+", help="ENVVAR=value per arm ('-' unsets)")
    ap.add_argument("--model", default="timm/fastvit_t8.apple_in1k")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from dino_pose_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    arms = []
    for spec in args.arms:
        var, _, val = spec.partition("=")
        arms.append((var, val))

    lr = jnp.float32(3e-5)
    key = jax.random.key(0)
    built = []
    for var, val in arms:
        prev = os.environ.get(var)
        if val == "-":
            os.environ.pop(var, None)
        else:
            os.environ[var] = val
        try:
            step, state, batch = build_step(args.model, args.bs, args.size)
            for _ in range(3):
                state, _ = step(state, batch, lr, key)
            jax.block_until_ready(state)
            built.append({"name": f"{var}={val}", "step": step, "state": state,
                          "batch": batch, "times": []})
        finally:
            if prev is None:
                os.environ.pop(var, None)
            else:
                os.environ[var] = prev

    for rep in range(args.reps):
        for arm in built:
            state = arm["state"]
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, _ = arm["step"](state, arm["batch"], lr, key)
            jax.block_until_ready(state)
            ms = (time.perf_counter() - t0) / args.steps * 1000
            arm["state"] = state
            arm["times"].append(ms)
            print(f"rep{rep} {arm['name']:34s} {ms:7.2f} ms/step "
                  f"({args.bs / ms * 1000:7.1f} img/s)", flush=True)

    print()
    for arm in built:
        best = min(arm["times"])
        print(f"{arm['name']:34s} best {best:7.2f} ms/step "
              f"({args.bs / best * 1000:7.1f} img/s)  all={['%.2f' % t for t in arm['times']]}")


if __name__ == "__main__":
    main()
