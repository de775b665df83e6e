"""Per-stage ConvFFN microbenchmark: fused kernel vs XLA branch math.

Times forward and forward+backward of ONE ConvFFN at each FastViT-T8 stage
geometry (bs=128, 256^2 input) in both dispatch modes, isolating the fused
kernel's contribution from the rest of the train step. Run on the real TPU.

Usage: python scripts/microbench_convffn.py [iters]
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

from dino_pose_tpu.models.fastvit import ConvFFN

# (tag, B, H, W, C) — t8 stage grids at 256^2; hidden = 3C.
SHAPES = [
    ("stage0", 128, 64, 64, 48),
    ("stage1", 128, 32, 32, 96),
    ("stage2", 128, 16, 16, 192),
    ("stage3", 128, 8, 8, 384),
]


def bench(mode: str, shape, iters: int, with_bwd: bool) -> float:
    os.environ["DINO_POSE_TPU_CONVFFN"] = mode
    tag, b, h, w, c = shape
    m = ConvFFN(hidden=3 * c, lora_rank=8, lora_alpha=16.0, lora_dropout=0.1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32), jnp.bfloat16)
    variables = m.init(jax.random.key(0), x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    key = jax.random.key(1)

    if with_bwd:
        def loss(params, x):
            out, _ = m.apply(
                {"params": params, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    else:
        def fwd(params, x):
            out, _ = m.apply(
                {"params": params, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            return out

        fn = jax.jit(fwd)

    r = fn(params, x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(params, x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000


def main() -> None:
    from dino_pose_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"{'shape':8s} {'pass':8s} {'xla ms':>9s} {'kernel ms':>9s} {'speedup':>8s}")
    for shape in SHAPES:
        for with_bwd in (False, True):
            xla = bench("xla", shape, iters, with_bwd)
            ker = bench("force", shape, iters, with_bwd)
            os.environ.pop("DINO_POSE_TPU_CONVFFN", None)
            print(
                f"{shape[0]:8s} {'fwd+bwd' if with_bwd else 'fwd':8s}"
                f" {xla:9.3f} {ker:9.3f} {xla / ker:8.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
