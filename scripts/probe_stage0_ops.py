"""Time the individual ops of a FastViT stage-0 block on the TPU.

The stage ablation (probe_fastvit_stages.py) attributes 28.1 ms of the t8
step to stage0's two RepMixer+ConvFFN blocks; this probe breaks one block
into its constituent ops and times each in isolation so the fused-kernel
design targets measured costs. Also A/Bs the banded-Toeplitz matmul
formulation of the depthwise convs (MXU) against XLA's grouped-conv
lowering.

Measurement methodology (the axon tunnel defeats naive timing):

- A candidate op ``f`` runs inside one jitted ``lax.fori_loop`` chained
  through a renormalised square (non-affine, so XLA's algebraic/range
  simplifier cannot collapse the chain — plain ``x*a+b`` or relu chains DO
  fold and report ~0).
- The loop runs at two iteration counts; differencing the wall times
  cancels the ~20-80 ms dispatch/round-trip intercept (which otherwise
  inflates every per-iteration number).
- The op cost is the marginal of applying ``f`` TWICE per iteration vs
  once, which cancels the renorm-chain overhead exactly.

Usage: python scripts/probe_stage0_ops.py
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
from jax import lax

B, H, W, C = 128, 64, 64, 48
HID = 144
DT = jnp.bfloat16
N_LO, N_HI = 40, 160


def dw_conv(x, k, kk):
    """XLA grouped depthwise conv, NHWC, zero padding."""
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(kk // 2, kk // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def toeplitz_w(k, kk, w, dtype):
    """Banded matrices T[c, dy, w_in, w_out] with T = k[dy, w_in - w_out, c]."""
    wi = w + kk - 1
    t = np.zeros((k.shape[-1], kk, wi, w), np.float32)
    kn = np.asarray(k, np.float32)  # (kk, kk, C)
    for dy in range(kk):
        for dx in range(kk):
            for wo in range(w):
                t[:, dy, wo + dx, wo] = kn[dy, dx, :]
    return jnp.asarray(t, dtype)


def dw_conv_toeplitz(x, t, kk):
    """y[b,h,w,c] = sum_{dy,wi} xpad[b,h+dy,wi,c] * T[c,dy,wi,w]."""
    p = kk // 2
    h = x.shape[1]
    xp = jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)])
    rows = jnp.stack([xp[:, dy : dy + h, :, :] for dy in range(kk)], axis=1)
    return jnp.einsum(
        "bdhvc,cdvw->bhwc", rows, t.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _renorm(y, dtype):
    y32 = y.astype(jnp.float32)
    return (y32 * lax.rsqrt(jnp.mean(jnp.square(y32)) + 1e-6)).astype(dtype)


def _marginal(body, x0):
    """Per-iteration wall time of ``x = body(x)`` with the dispatch
    intercept differenced out (N_LO vs N_HI iteration loops)."""

    def run_n(n):
        return jax.jit(
            lambda x: lax.fori_loop(0, n, lambda i, x: body(x), x),
            donate_argnums=0,
        )

    def wall(run):
        x = run(jnp.copy(x0))
        x.block_until_ready()
        best = float("inf")
        for _ in range(3):
            x = jnp.copy(x0)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            x = run(x)
            x.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    return (wall(run_n(N_HI)) - wall(run_n(N_LO))) / (N_HI - N_LO) * 1000


def timeit(name, f, x0):
    """Cost of one application of f: double-apply marginal minus single."""
    one = _marginal(lambda x: _renorm(f(x), x0.dtype), x0)
    two = _marginal(lambda x: _renorm(f(f(x)), x0.dtype), x0)
    ms = two - one
    print(f"{name:40s} {ms:8.3f} ms   (chain {one:6.3f})", flush=True)
    return ms


def grad_of(f):
    """fwd+bwd with a data-dependent cotangent (grad of mean of squares)."""
    g = jax.grad(lambda x: jnp.mean(jnp.square(f(x).astype(jnp.float32))))
    return lambda x: g(x).astype(DT)


def main():
    from dino_pose_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32), DT)
    k3 = jnp.asarray(rng.normal(size=(3, 3, C)).astype(np.float32) * 0.2)
    k7 = jnp.asarray(rng.normal(size=(7, 7, C)).astype(np.float32) * 0.08)
    k3io = k3[:, :, None, :]
    k7io = k7[:, :, None, :]
    t7 = toeplitz_w(k7, 7, W, DT)
    w1 = jnp.asarray(rng.normal(size=(C, HID)).astype(np.float32) * 0.1, DT)
    w2 = jnp.asarray(rng.normal(size=(HID, C)).astype(np.float32) * 0.1, DT)

    def statnorm(x):
        m = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
        m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2))
        return (x.astype(jnp.float32) * lax.rsqrt(m2 - m * m + 1e-5) - m).astype(DT)

    def ffn(x):
        h = jnp.einsum("bhwc,cf->bhwf", x, w1, preferred_element_type=jnp.float32)
        g = jax.nn.gelu(h.astype(DT), approximate=False)
        return jnp.einsum(
            "bhwf,fc->bhwc", g, w2, preferred_element_type=jnp.float32
        ).astype(DT)

    print(f"shapes: x=({B},{H},{W},{C}) bf16, hidden={HID}; "
          f"loops {N_LO}->{N_HI}\n")
    from dino_pose_tpu.ops import dwconv as DW

    timeit("gelu exact (C=48)", lambda x: jax.nn.gelu(x, approximate=False), x0)
    timeit("dw3 XLA fwd", lambda x: dw_conv(x, k3io, 3), x0)
    timeit("dw3 pallas fwd", lambda x: DW.dw_conv_frozen(x, k3io), x0)
    timeit("dw7 XLA fwd", lambda x: dw_conv(x, k7io, 7), x0)
    timeit("dw7 pallas fwd", lambda x: DW.dw_conv_frozen(x, k7io), x0)
    timeit("dw7 toeplitz fwd", lambda x: dw_conv_toeplitz(x, t7, 7), x0)
    timeit("dw7 XLA fwd+bwd", grad_of(lambda x: dw_conv(x, k7io, 7)), x0)
    timeit("dw7 pallas fwd+bwd", grad_of(lambda x: DW.dw_conv_frozen(x, k7io)), x0)
    timeit("BN moments+affine fwd", statnorm, x0)
    timeit("BN moments+affine fwd+bwd", grad_of(statnorm), x0)
    timeit("ffn (fc1+gelu+fc2) fwd", ffn, x0)
    timeit("ffn (fc1+gelu+fc2) fwd+bwd", grad_of(ffn), x0)
    print()

    # Whole stage0 block through the real model, fwd+bwd, branch vs reuse.
    import dataclasses
    from dino_pose_tpu.models import fastvit

    cfg = dataclasses.replace(
        fastvit.FASTVIT_PRESETS["t8"], lora_rank=8, depths=(1, 0, 0, 0)
    )

    class OneBlock(fastvit.nn.Module):
        @fastvit.nn.compact
        def __call__(self, x, *, train):
            return fastvit.FastViTBlock(
                mixer="repmixer", mlp_ratio=3.0, cfg=cfg, name="blk"
            )(x, train=train)

    mod = OneBlock()
    variables = mod.init(
        jax.random.key(0), jnp.zeros((1, H, W, C), DT), train=False
    )
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def block_fb(x):
        def loss(xx):
            out, _ = mod.apply(
                {"params": params, "batch_stats": bstats}, xx, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)},
            )
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        return jax.grad(loss)(x).astype(DT)

    for mode in ("branch", "reuse"):
        os.environ["DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS"] = mode
        timeit(f"stage0 block fwd+bwd [{mode}]", block_fb, x0)
    os.environ.pop("DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS", None)


if __name__ == "__main__":
    main()
