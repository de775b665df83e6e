"""Hardware parity + timing probe for the weight-streaming kernels.

Compiled-Mosaic behavior can diverge from interpret mode (the tests'
backend), so after any plan/kernel change the streamed halves must be
re-validated ON the TPU against the unfused math, and their per-layer
time sanity-checked against the HBM roofline (weights are re-read
B/rows_per_program times per layer — a "too fast" result means the
computation collapsed, not that the kernel got better).

Usage: python scripts/probe_stream_tpu.py [D] [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dino_pose_tpu.ops.block import (
    AttnParams,
    MlpParams,
    _stream_attn_plan,
    _stream_mlp_plan,
    attn_part_math,
    fused_attn_part_stream,
    fused_mlp_part_stream,
    mlp_part_math,
)


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    s = 257
    heads = {384: 6, 768: 12, 1024: 16}[d]
    sp = -(-s // 8) * 8
    print("mlp plan:", _stream_mlp_plan(sp, d, 2, b))
    print("attn plan:", _stream_attn_plan(sp, d, d // heads, 2, b, heads))

    rng = np.random.default_rng(0)
    r = lambda *sh: jnp.asarray(
        rng.standard_normal(sh).astype(np.float32) * 0.05
    )
    x = r(b, s, d).astype(jnp.bfloat16)
    ap = AttnParams(g1=1 + r(d), b1=r(d), wqkv=r(d, 3 * d), bqkv=r(3 * d),
                    wo=r(d, d), bo=r(d))
    mp = MlpParams(g2=1 + r(d), b2=r(d), w1=r(d, 4 * d), bf1=r(4 * d),
                   w2=r(4 * d, d), bf2=r(d), ls2=1 + r(d))

    f_stream_m = jax.jit(lambda x_: fused_mlp_part_stream(x_, mp, 1e-6))
    f_math_m = jax.jit(lambda x_: mlp_part_math(x_, mp, eps=1e-6))
    f_stream_a = jax.jit(lambda x_: fused_attn_part_stream(x_, ap, heads, 1e-6))
    f_math_a = jax.jit(lambda x_: attn_part_math(x_, ap, num_heads=heads, eps=1e-6))

    for name, fk, fr in (("mlp", f_stream_m, f_math_m),
                         ("attn", f_stream_a, f_math_a)):
        yk = np.asarray(fk(x), dtype=np.float32)
        yr = np.asarray(fr(x), dtype=np.float32)
        err = np.max(np.abs(yk - yr)) / (np.max(np.abs(yr)) + 1e-9)
        zero_frac = float(np.mean(yk == 0.0))
        print(f"{name}: rel-err {err:.2e}  zero-frac {zero_frac:.3f}  "
              f"|y| {np.abs(yk).mean():.4f} vs {np.abs(yr).mean():.4f}")

        for tag, f in (("stream", fk), ("xla", fr)):
            f(x).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(20):
                y = f(x)
            y.block_until_ready()
            ms = (time.perf_counter() - t0) / 20 * 1e3
            print(f"  {name}/{tag}: {ms:.3f} ms/layer-half (B={b})")

    # Frozen-dx backward (the LoRA adapter's cotangent path): hardware
    # gradients of the streaming MLP half vs the unfused math.
    def loss_k(x_):
        return jnp.sum(jnp.square(fused_mlp_part_stream(x_, mp, 1e-6, True)))

    def loss_r(x_):
        return jnp.sum(jnp.square(mlp_part_math(x_, mp, eps=1e-6)))

    gk = np.asarray(jax.jit(jax.grad(loss_k))(x), dtype=np.float32)
    gr = np.asarray(jax.jit(jax.grad(loss_r))(x), dtype=np.float32)
    gerr = np.max(np.abs(gk - gr)) / (np.max(np.abs(gr)) + 1e-9)
    print(f"mlp frozen-dx grad: rel-err {gerr:.2e}  "
          f"|g| {np.abs(gk).mean():.5f} vs {np.abs(gr).mean():.5f}")


if __name__ == "__main__":
    main()
