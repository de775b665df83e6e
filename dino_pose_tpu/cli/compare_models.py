"""Compare inference speed of two models (reference: DINOv2-small vs
FastViT-T8, /root/reference/compare_models.py:9-89 — 10 timed iterations
each, speedup ratio printed)."""

from __future__ import annotations

import argparse

from dino_pose_tpu.cli.benchmark_model import benchmark_model


def main(argv=None) -> None:
    from dino_pose_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Compare two pose models")
    parser.add_argument("--model_a", type=str, default="facebook/dinov2-small")
    parser.add_argument("--model_b", type=str, default="timm/fastvit_t8.apple_in1k")
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args(argv)

    a = benchmark_model(args.model_a, iters=args.iters)
    b = benchmark_model(args.model_b, iters=args.iters)

    print("\nComparison (end-to-end):")
    print(f"  {a['model']}: {a['avg_ms']:.2f} ms ({a['fps']:.1f} FPS), {a['params']:,} params")
    print(f"  {b['model']}: {b['avg_ms']:.2f} ms ({b['fps']:.1f} FPS), {b['params']:,} params")
    ratio = a["avg_ms"] / b["avg_ms"]
    faster, slower = (b, a) if ratio > 1 else (a, b)
    print(f"  {faster['model']} is {max(ratio, 1 / ratio):.2f}x faster than {slower['model']}")


if __name__ == "__main__":
    main()
