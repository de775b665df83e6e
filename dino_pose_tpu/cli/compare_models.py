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
    parser.add_argument(
        "--device-time", action="store_true",
        help="also report ON-DEVICE forward+decode latency (chained-forward "
        "marginals; the end-to-end column includes the host round trip, "
        "which under the axon tunnel is ~30 ms of transport, not compute)",
    )
    args = parser.parse_args(argv)

    a = benchmark_model(args.model_a, iters=args.iters)
    b = benchmark_model(args.model_b, iters=args.iters)
    if args.device_time:
        from bench import bench_infer

        for r in (a, b):
            size = 256 if "fastvit" in r["model"] else 224
            r["device_ms"] = bench_infer(r["model"], image_size=size)["device_ms"]

    print("\nComparison (end-to-end):")
    for r in (a, b):
        dev = f", {r['device_ms']:.2f} ms on-device" if "device_ms" in r else ""
        print(
            f"  {r['model']}: {r['avg_ms']:.2f} ms ({r['fps']:.1f} FPS), "
            f"{r['params']:,} params{dev}"
        )
    ratio = a["avg_ms"] / b["avg_ms"]
    faster, slower = (b, a) if ratio > 1 else (a, b)
    print(f"  {faster['model']} is {max(ratio, 1 / ratio):.2f}x faster than {slower['model']}")
    if args.device_time:
        rd = a["device_ms"] / b["device_ms"]
        fd, sd = (b, a) if rd > 1 else (a, b)
        print(
            f"  on-device: {fd['model']} is {max(rd, 1 / rd):.2f}x faster "
            f"than {sd['model']}"
        )


if __name__ == "__main__":
    main()
