"""Single-model inference benchmark.

Reference shape (/root/reference/benchmark_model.py): 3 warmup + 20 timed
single-image inferences of dinov2-small, average ms / FPS / parameter count /
real-time verdict. Two timings are reported here because the TPU path
separates them cleanly: end-to-end (preprocessing included, like the
reference) and device-only step latency (``block_until_ready`` around the
jitted forward), which is the number that matters for serving.
"""

from __future__ import annotations

import argparse
import statistics
import time

import numpy as np


def benchmark_model(
    model_name: str = "facebook/dinov2-small",
    warmup: int = 3,
    iters: int = 20,
    image_size: int | None = None,
) -> dict:
    import jax

    from dino_pose_tpu.data.preprocess import create_preprocessor
    from dino_pose_tpu.io.checkpoint import load_model_smart
    from dino_pose_tpu.models.registry import resolve_model_name

    model = load_model_smart(model_name)
    proc = create_preprocessor(resolve_model_name(model.model_name))
    size = image_size or model.input_size

    from PIL import Image

    rng = np.random.default_rng(0)
    image = Image.fromarray(rng.integers(0, 256, (size, size, 3), dtype=np.uint8))

    fwd = jax.jit(lambda v, x: model.module.apply(v, x, train=False))
    variables = jax.device_put(model.variables)  # ship params once

    def end_to_end():
        pixels = proc(image)["pixel_values"]
        hm, z = fwd(variables, pixels)
        jax.block_until_ready((hm, z))

    pixels_const = proc(image)["pixel_values"]

    def device_only():
        jax.block_until_ready(fwd(variables, pixels_const))

    for _ in range(warmup):
        end_to_end()
    e2e = []
    for _ in range(iters):
        t0 = time.perf_counter()
        end_to_end()
        e2e.append((time.perf_counter() - t0) * 1e3)
    dev = []
    for _ in range(iters):
        t0 = time.perf_counter()
        device_only()
        dev.append((time.perf_counter() - t0) * 1e3)

    params = model.count_parameters(trainable_only=False)
    avg_ms = statistics.mean(e2e)
    dev_ms = statistics.mean(dev)
    result = {
        "model": model.model_name,
        "avg_ms": avg_ms,
        "p50_ms": statistics.median(e2e),
        "fps": 1e3 / avg_ms,
        "device_ms": dev_ms,
        "device_p50_ms": statistics.median(dev),
        "device_fps": 1e3 / dev_ms,
        "params": params,
    }
    print(f"\nBenchmark: {result['model']}")
    print(f"  Parameters:            {params:,}")
    print(f"  End-to-end average:    {avg_ms:.2f} ms  ({result['fps']:.1f} FPS)")
    print(f"  Device-only average:   {dev_ms:.2f} ms  ({result['device_fps']:.1f} FPS)")
    print(f"  Real-time 30 FPS: {'YES' if result['fps'] >= 30 else 'NO'}   "
          f"60 FPS: {'YES' if result['fps'] >= 60 else 'NO'}")
    return result


def main(argv=None) -> None:
    from dino_pose_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Benchmark pose model inference")
    parser.add_argument("--model", type=str, default="facebook/dinov2-small",
                        help="Checkpoint path, backbone name, or family name")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    args = parser.parse_args(argv)
    benchmark_model(args.model, warmup=args.warmup, iters=args.iters)


if __name__ == "__main__":
    main()
