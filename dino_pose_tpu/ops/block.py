"""Fused transformer-block Pallas kernel.

Motivation (PERFORMANCE.md device trace, v5e, dinov2-small bs=128 train
step): of a 44.3 ms step, ~11.8 ms were LayerNorm(+residual/LayerScale)
fusions and ~5.7 ms softmax fusions — all HBM round-trips between the
block's matmuls. This kernel runs an ENTIRE pre-norm ViT block
(/root/reference's HF ``Dinov2Layer`` topology: LN1 -> qkv -> multi-head
attention -> output projection -> LayerScale -> residual -> LN2 -> MLP
(exact GELU) -> LayerScale -> residual) as ONE Pallas program per batch
slice: activations, attention scores and the 4x MLP hidden tensor never
leave VMEM. Per layer, HBM traffic drops to: read x once, write y once,
read the (bf16) weights once.

Scope and dispatch (see ``models/vit.py``):

- Used for layers whose parameters are FROZEN (the production configs —
  LoRA r=8 or unfreeze-last-N — freeze every block below the adapted/
  unfrozen top, /root/reference/model/dinov2_pose.py:20-39,197-204), and
  for all non-LoRA layers at inference. Backward never flows through
  frozen blocks (the trainer differentiates only the trainable subtree,
  train/step.py), so the kernel needs no Pallas backward there.
- Differentiating through it IS still correct: the custom_vjp falls back
  to ``jax.vjp`` of :func:`block_math` — the numerically-identical unfused
  formulation below, which is also the module's non-fused compute path.
- Weights must fit VMEM alongside one batch row's activations: true for
  hidden_size <= ~512 (dinov2-small: 12*D^2 bf16 weights = 3.5 MB).
  Larger backbones use the unfused path (XLA) until a weight-streaming
  variant exists.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dino_pose_tpu.ops.dispatch import (
    configure_for_mesh,  # noqa: F401  (re-exported for core.mesh)
    target as _dispatch_target,
)

Array = jax.Array

_NEG_INF = -1e30


class BlockParams(NamedTuple):
    """One transformer block's parameters (a pytree; dtypes as stored).

    Weight layouts match nn/layers.Dense: kernels are (in, out).
    ``wqkv``/``bqkv`` are the q|k|v kernels/biases concatenated on the
    output axis (the module already runs qkv as one fused matmul).
    """

    g1: Array       # (D,)   norm1 scale
    b1: Array       # (D,)   norm1 bias
    wqkv: Array     # (D, 3D)
    bqkv: Array     # (3D,)
    wo: Array       # (D, D)
    bo: Array       # (D,)
    ls1: Array      # (D,)   layerscale1
    g2: Array       # (D,)
    b2: Array       # (D,)
    w1: Array       # (D, 4D)
    bf1: Array      # (4D,)
    w2: Array       # (4D, D)
    bf2: Array      # (D,)
    ls2: Array      # (D,)


def _erf(x: Array) -> Array:
    """float32 erf from primitives Pallas can lower (no erf/erfc on TPU).

    Abramowitz & Stegun 7.1.26 rational approximation, |error| <= 1.5e-7 —
    three orders of magnitude below bf16 resolution, so exact-GELU computed
    with it is bitwise-indistinguishable from lax.erf after the bf16 cast.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x: Array) -> Array:
    """Exact GELU (matches jax.nn.gelu(approximate=False) within bf16)."""
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + _erf(xf * (2.0**-0.5)))).astype(x.dtype)


def _layernorm(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    """float32-stats LayerNorm, output in x.dtype (nn/layers.LayerNorm)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


def _dense(x: Array, w: Array, b: Array) -> Array:
    """bf16-MXU dense matching nn/layers.Dense numerics."""
    return (jnp.dot(x, w.astype(x.dtype)) + b.astype(x.dtype)).astype(x.dtype)


def block_math(
    x: Array,
    p: BlockParams,
    *,
    num_heads: int,
    eps: float,
    adapter=None,
) -> Array:
    """Unfused reference formulation (XLA path + custom_vjp fallback).

    Numerically identical to the fused kernel; ``adapter`` is an optional
    callable applied residually to the attention output (the LoRA hook,
    /root/reference/model/lora.py:53-65 semantics — LoRA layers always take
    this path).
    """
    from dino_pose_tpu.ops.attention import attention

    b, s, d = x.shape
    dh = d // num_heads

    h = _layernorm(x, p.g1, p.b1, eps)
    qkv = _dense(h, p.wqkv, p.bqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):
        return t.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)

    ctx = attention(split(q), split(k), split(v), scale=dh**-0.5)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
    out = _dense(ctx, p.wo, p.bo)
    if adapter is not None:
        out = out + adapter(out)
    x = x + out * p.ls1.astype(out.dtype)

    h = _layernorm(x, p.g2, p.b2, eps)
    h = _dense(h, p.w1, p.bf1)
    h = jax.nn.gelu(h, approximate=False)
    h = _dense(h, p.w2, p.bf2)
    return x + h * p.ls2.astype(h.dtype)


# ---------------------------------------------------------------------------
# Fused kernel
# ---------------------------------------------------------------------------

def _block_kernel(
    x_ref, g1, b1, wqkv, bqkv, wo, bo, ls1, g2, b2, w1, bf1, w2, bf2, ls2,
    y_ref, *maybe_x2_ref, num_heads: int, eps: float, valid_len: int,
):
    x = x_ref[...]                       # (G, Sp, D)
    d = x.shape[-1]
    dh = d // num_heads
    scale = dh**-0.5
    sp = x.shape[1]

    a = _layernorm(x, g1[0], b1[0], eps)
    qkv = (
        jax.lax.dot_general(
            a, wqkv[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bqkv[0].astype(x.dtype)
    )

    # Per-head attention, scores resident in VMEM. Head slices are static
    # 64-lane column windows of the fused qkv tensor.
    ctx_parts = []
    for h in range(num_heads):
        q = qkv[:, :, h * dh : (h + 1) * dh]
        k = qkv[:, :, d + h * dh : d + (h + 1) * dh]
        v = qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                        # (G, Sp, Sp) f32
        if valid_len < sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
            s = jnp.where(col < valid_len, s, _NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        ctx_parts.append(
            jax.lax.dot_general(
                probs, v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    ctx = jnp.concatenate(ctx_parts, axis=-1)

    o = (
        jax.lax.dot_general(
            ctx, wo[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bo[0].astype(x.dtype)
    )
    x2 = x + o * ls1[0].astype(x.dtype)
    if maybe_x2_ref:  # training path saves the attention residual
        maybe_x2_ref[0][...] = x2

    m = _layernorm(x2, g2[0], b2[0], eps)
    h1 = (
        jax.lax.dot_general(
            m, w1[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bf1[0].astype(x.dtype)
    )
    h1 = _gelu_exact(h1)
    h2 = (
        jax.lax.dot_general(
            h1, w2[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bf2[0].astype(x.dtype)
    )
    y_ref[...] = x2 + h2 * ls2[0].astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused TRAINING path: forward that also emits the attention residual x2,
# plus a two-kernel Pallas backward (MLP part, then attention part) with
# weight gradients accumulated in VMEM across the sequential batch grid.
# Covers full-block training (the reference's unfreeze-last-N mode, which
# has no dropout inside the block); LoRA layers keep the module path.
# ---------------------------------------------------------------------------

_SQRT_2PI_INV = 0.3989422804014327  # 1/sqrt(2*pi)


def _gelu_grad(z: Array) -> Array:
    """d/dz of exact GELU at pre-activation z (float32 in/out)."""
    phi = jnp.exp(-0.5 * z * z) * _SQRT_2PI_INV
    cdf = 0.5 * (1.0 + _erf(z * (2.0**-0.5)))
    return cdf + z * phi


def _ln_fwd_stats(x, scale, bias, eps):
    """LayerNorm forward returning (out[x.dtype], xhat[f32], r[f32])."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * r
    return (xhat * scale + bias).astype(x.dtype), xhat, r


def _ln_bwd_dx(dout_f32, xhat, r, scale):
    """Input-gradient of LayerNorm (f32)."""
    dh = dout_f32 * scale
    mean1 = jnp.mean(dh, axis=-1, keepdims=True)
    mean2 = jnp.mean(dh * xhat, axis=-1, keepdims=True)
    return r * (dh - mean1 - xhat * mean2)


def _mm(a, b, contract_a, contract_b, batch=None):
    lhs_b, rhs_b = batch or ((), ())
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=((contract_a, contract_b), (lhs_b, rhs_b)),
        preferred_element_type=jnp.float32,
    )


def _mlp_bwd_kernel(
    x2_ref, dy_ref, g2, b2, w1, bf1, w2, bf2, ls2,
    dx2_ref, dw1_ref, dbf1_ref, dw2_ref, dbf2_ref, dls2_ref, dg2_ref, db2_ref,
    *, eps: float,
):
    """Backward of  y = x2 + (gelu(LN2(x2) W1 + bf1) W2 + bf2) * ls2.

    One batch row per program, all tensors 2-D — Mosaic's matmul does not
    lower dot_generals that contract a batch dim together with a row dim.
    """
    i = pl.program_id(0)
    x2 = x2_ref[0]                                    # (Sp, D) bf16
    dy = dy_ref[0].astype(jnp.float32)
    dt = x2.dtype

    m, xhat2, r2 = _ln_fwd_stats(x2, g2[0], b2[0], eps)
    h1 = (_mm(m, w1[...], (1,), (0,)).astype(dt) + bf1[0].astype(dt))
    g = _gelu_exact(h1)
    h2 = (_mm(g, w2[...], (1,), (0,)).astype(dt) + bf2[0].astype(dt))

    dls2_p = jnp.sum(dy * h2.astype(jnp.float32), axis=0)[None, :]
    dh2 = dy * ls2[0]                                  # f32
    dh2b = dh2.astype(dt)
    dw2_p = _mm(g, dh2b, (0,), (0,))                   # (4D, D) f32
    dbf2_p = jnp.sum(dh2, axis=0)[None, :]
    dg = _mm(dh2b, w2[...], (1,), (1,)).astype(jnp.float32)
    dh1 = dg * _gelu_grad(h1.astype(jnp.float32))
    dh1b = dh1.astype(dt)
    dw1_p = _mm(m, dh1b, (0,), (0,))                   # (D, 4D) f32
    dbf1_p = jnp.sum(dh1, axis=0)[None, :]
    dm = _mm(dh1b, w1[...], (1,), (1,)).astype(jnp.float32)
    dg2_p = jnp.sum(dm * xhat2, axis=0)[None, :]
    db2_p = jnp.sum(dm, axis=0)[None, :]
    dx2_ref[0] = (dy + _ln_bwd_dx(dm, xhat2, r2, g2[0])).astype(dt)

    @pl.when(i == 0)
    def _init():
        for ref in (dw1_ref, dbf1_ref, dw2_ref, dbf2_ref,
                    dls2_ref, dg2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    dw1_ref[...] += dw1_p
    dbf1_ref[...] += dbf1_p
    dw2_ref[...] += dw2_p
    dbf2_ref[...] += dbf2_p
    dls2_ref[...] += dls2_p
    dg2_ref[...] += dg2_p
    db2_ref[...] += db2_p


def _attn_bwd_kernel(
    x_ref, dx2_ref, g1, b1, wqkv, bqkv, wo, bo, ls1,
    dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dls1_ref, dg1_ref, db1_ref,
    *, num_heads: int, eps: float, valid_len: int,
):
    """Backward of  x2 = x + (attn(LN1(x)) Wo + bo) * ls1."""
    i = pl.program_id(0)
    x = x_ref[0]                                       # (Sp, D) bf16
    dx2 = dx2_ref[0].astype(jnp.float32)
    dt = x.dtype
    d = x.shape[-1]
    dh = d // num_heads
    scale = dh**-0.5
    sp = x.shape[0]

    a, xhat1, r1 = _ln_fwd_stats(x, g1[0], b1[0], eps)
    qkv = (_mm(a, wqkv[...], (1,), (0,)).astype(dt) + bqkv[0].astype(dt))

    # Recompute per-head probs (masked exactly like the forward).
    probs = []
    for h in range(num_heads):
        q = qkv[:, h * dh : (h + 1) * dh]
        k = qkv[:, d + h * dh : d + (h + 1) * dh]
        s = _mm(q, k, (1,), (1,)) * scale              # (Sp, Sp) f32
        if valid_len < sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(col < valid_len, s, _NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        probs.append(e / jnp.sum(e, axis=-1, keepdims=True))  # f32

    ctx = jnp.concatenate(
        [
            _mm(probs[h].astype(dt),
                qkv[:, 2 * d + h * dh : 2 * d + (h + 1) * dh],
                (1,), (0,)).astype(dt)
            for h in range(num_heads)
        ],
        axis=-1,
    )
    o = (_mm(ctx, wo[...], (1,), (0,)).astype(dt) + bo[0].astype(dt))

    dls1_p = jnp.sum(dx2 * o.astype(jnp.float32), axis=0)[None, :]
    do = dx2 * ls1[0]
    dob = do.astype(dt)
    dwo_p = _mm(ctx, dob, (0,), (0,))                  # (D, D) f32
    dbo_p = jnp.sum(do, axis=0)[None, :]
    dctx = _mm(dob, wo[...], (1,), (1,)).astype(dt)    # (Sp, D)

    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(num_heads):
        p_h = probs[h]                                 # (Sp, Sp) f32
        pb = p_h.astype(dt)
        q = qkv[:, h * dh : (h + 1) * dh]
        k = qkv[:, d + h * dh : d + (h + 1) * dh]
        v = qkv[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        dctx_h = dctx[:, h * dh : (h + 1) * dh]
        dp = _mm(dctx_h, v, (1,), (1,))                # (Sp, Sp) f32
        ds = p_h * (dp - jnp.sum(p_h * dp, axis=-1, keepdims=True))
        dsb = ds.astype(dt)
        dq_parts.append((_mm(dsb, k, (1,), (0,)) * scale).astype(dt))
        dk_parts.append((_mm(dsb, q, (0,), (0,)) * scale).astype(dt))
        dv_parts.append(_mm(pb, dctx_h, (0,), (0,)).astype(dt))
    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)

    dwqkv_p = _mm(a, dqkv, (0,), (0,))                 # (D, 3D) f32
    dbqkv_p = jnp.sum(dqkv.astype(jnp.float32), axis=0)[None, :]
    da = _mm(dqkv, wqkv[...], (1,), (1,)).astype(jnp.float32)
    dg1_p = jnp.sum(da * xhat1, axis=0)[None, :]
    db1_p = jnp.sum(da, axis=0)[None, :]
    dx_ref[0] = (dx2 + _ln_bwd_dx(da, xhat1, r1, g1[0])).astype(dt)

    @pl.when(i == 0)
    def _init():
        for ref in (dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                    dls1_ref, dg1_ref, db1_ref):
            ref[...] = jnp.zeros_like(ref)

    dwqkv_ref[...] += dwqkv_p
    dbqkv_ref[...] += dbqkv_p
    dwo_ref[...] += dwo_p
    dbo_ref[...] += dbo_p
    dls1_ref[...] += dls1_p
    dg1_ref[...] += dg1_p
    db1_ref[...] += db1_p


_VMEM_BUDGET = 10 * 1024 * 1024


def _block_working_set(
    sp: int, d: int, itemsize: int, hidden: int | None = None
) -> tuple[int, int]:
    """(weights_bytes, per_batch_row_bytes) of the fused kernel in VMEM.

    ``hidden`` is the actual fc1 width; None models the ratio-4 default
    (qkv+out 4 D², fc1+fc2 2 D·h = 12 D² at h = 4D)."""
    h = 4 * d if hidden is None else hidden
    weights = 4 * d * d * itemsize + 2 * d * h * itemsize
    per_row = 9 * sp * d * itemsize + 2 * sp * h * itemsize + sp * sp * 4
    return weights, per_row


def _rows_per_program(
    sp: int, d: int, itemsize: int, hidden: int | None = None
) -> int:
    """Largest batch-rows-per-program whose working set fits VMEM.

    Returns 0 when even one row does not fit (long sequences) — callers
    must fall back to the unfused path (``fused_blocks_enabled`` gates on
    this, so in practice the kernel is never built for such shapes).
    """
    weights, per_row = _block_working_set(sp, d, itemsize, hidden)
    g = int((_VMEM_BUDGET - weights) // max(1, per_row))
    for cand in (8, 4, 2, 1):
        if cand <= g:
            return cand
    return 0


def _part_g_override() -> int:
    """Probe hook: force rows-per-program for the split-half FORWARD
    kernels (``DINO_POSE_TPU_PART_G``). 0 = use the computed default."""
    return int(os.environ.get("DINO_POSE_TPU_PART_G", "0") or 0)


def _part_rows(
    sp: int, d: int, itemsize: int, b: int, hidden: int | None = None
) -> int:
    """Rows-per-program for the split-half kernels (whole and TP-partial):
    the ``DINO_POSE_TPU_PART_G`` probe hook REPLACES the computed default,
    and the result is clamped to divide the batch. The size model is the
    (conservative: whole-block) working set with the MLP hidden term at
    the actual fc1 width."""
    g = max(_part_g_override() or _rows_per_program(sp, d, itemsize, hidden), 1)
    while b % g:
        g //= 2
    return g


_FWD_VMEM_BUDGET = 12 * 1024 * 1024


def _fwd_rows_per_program(sp: int, d: int, itemsize: int) -> int:
    """Rows-per-program for the FROZEN forward kernel only.

    The forward carries no f32 weight-gradient scratch, so it affords a
    larger model-budget than the shared ``_rows_per_program`` (10 MB).
    Calibrated on hardware (dinov2-small, Sp=264, bf16): g=2 compiles at
    ~12.7 MB scoped VMEM and runs 31.1 -> 29.8 ms/step end-to-end (+4.6%
    throughput); g=4 is rejected by Mosaic at 21.3 MB. The byte model
    underestimates the compiler's scoped figure by ~1.16x, so the 12 MB
    model budget keeps actuals under the 16 MiB stack limit.
    """
    weights, per_row = _block_working_set(sp, d, itemsize)
    for cand in (8, 4, 2, 1):
        if weights + cand * per_row <= _FWD_VMEM_BUDGET:
            return cand
    return 0


_MAT_NAMES = frozenset({"wqkv", "wo", "w1", "w2"})


def _prep_block_args(x: Array, p, names: list[str]):
    """Pad x, cast weights, reshape vectors 2-D; return (xp, args, sp).

    ``p`` is any object exposing the requested fields (full BlockParams or
    a partial namespace for the split attention/MLP kernels).
    """
    b, s, d = x.shape
    sp = -(-s // 8) * 8  # sublane padding only; Mosaic pads lanes internally
    xp = jnp.pad(x, [(0, 0), (0, sp - s), (0, 0)]) if sp != s else x
    wdt = x.dtype
    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    prepared = [
        getattr(p, k).astype(wdt) if k in _MAT_NAMES else vec(getattr(p, k))
        for k in names
    ]
    return xp, prepared, sp


_CONST = lambda a: pl.BlockSpec(  # noqa: E731 — replicated (weight) operand
    a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
)


def _fused_forward(x: Array, p: BlockParams, num_heads: int, eps: float) -> Array:
    b, s, d = x.shape
    order = ["g1", "b1", "wqkv", "bqkv", "wo", "bo", "ls1",
             "g2", "b2", "w1", "bf1", "w2", "bf2", "ls2"]
    xp, args, sp = _prep_block_args(x, p, order)

    g = max(_fwd_rows_per_program(sp, d, x.dtype.itemsize), 1)
    # Probe hook: force rows-per-program for the FROZEN forward only (the
    # train/backward kernels keep their own grids and VMEM accounting).
    override = os.environ.get("DINO_POSE_TPU_FROZEN_G")
    if override:
        g = max(int(override), 1)
    while b % g:
        g //= 2

    const = _CONST
    xspec = pl.BlockSpec((g, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    flops_per_row = (
        2 * sp * d * 3 * d          # qkv
        + 4 * sp * sp * d            # attention
        + 2 * sp * d * d             # out proj
        + 4 * sp * d * 4 * d         # mlp
    )
    out = pl.pallas_call(
        functools.partial(
            _block_kernel, num_heads=num_heads, eps=eps, valid_len=s
        ),
        grid=(b // g,),
        in_specs=[xspec] + [const(a) for a in args],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_row,
            bytes_accessed=2 * b * sp * d * x.dtype.itemsize
            + 12 * d * d * x.dtype.itemsize,
            transcendentals=b * (num_heads * sp * sp + sp * 4 * d),
        ),
        interpret=_dispatch_target()[0] != "tpu",  # CPU runs interpreted
    )(xp, *args)
    return out[:, :s, :] if sp != s else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_block(x: Array, p: BlockParams, num_heads: int, eps: float) -> Array:
    """Fused-forward transformer block; differentiable via the unfused math."""
    return _fused_forward(x, p, num_heads, eps)


def _fwd(x, p, num_heads, eps):
    return _fused_forward(x, p, num_heads, eps), (x, p)


def _bwd(num_heads, eps, residuals, dy):
    # Fallback VJP: exact gradients through the unfused formulation. The
    # production trainer never differentiates through fused (frozen) blocks
    # — this path exists for correctness, not speed.
    x, p = residuals
    _, vjp = jax.vjp(
        lambda x_, p_: block_math(x_, p_, num_heads=num_heads, eps=eps), x, p
    )
    return vjp(dy)


fused_block.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Training-path host wrappers
# ---------------------------------------------------------------------------

def _fused_forward_train(x, p, num_heads, eps):
    """Fused forward that ALSO returns the attention residual x2 (padded
    shape), saved for the two-kernel Pallas backward."""
    b, s, d = x.shape
    order = ["g1", "b1", "wqkv", "bqkv", "wo", "bo", "ls1",
             "g2", "b2", "w1", "bf1", "w2", "bf2", "ls2"]
    xp, args, sp = _prep_block_args(x, p, order)
    xspec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, sp, d), x.dtype)
    y, x2 = pl.pallas_call(
        functools.partial(
            _block_kernel, num_heads=num_heads, eps=eps, valid_len=s
        ),
        grid=(b,),
        in_specs=[xspec] + [_CONST(a) for a in args],
        out_specs=[xspec, xspec],
        out_shape=[shape, shape],
        interpret=_dispatch_target()[0] != "tpu",
    )(xp, *args)
    return (y[:, :s, :] if sp != s else y), x2


def _grad_shapes(p: BlockParams, d: int):
    f32 = jnp.float32
    return {
        "wqkv": jax.ShapeDtypeStruct((d, 3 * d), f32),
        "bqkv": jax.ShapeDtypeStruct((1, 3 * d), f32),
        "wo": jax.ShapeDtypeStruct((d, d), f32),
        "bo": jax.ShapeDtypeStruct((1, d), f32),
        "ls1": jax.ShapeDtypeStruct((1, d), f32),
        "g1": jax.ShapeDtypeStruct((1, d), f32),
        "b1": jax.ShapeDtypeStruct((1, d), f32),
        "w1": jax.ShapeDtypeStruct((d, 4 * d), f32),
        "bf1": jax.ShapeDtypeStruct((1, 4 * d), f32),
        "w2": jax.ShapeDtypeStruct((4 * d, d), f32),
        "bf2": jax.ShapeDtypeStruct((1, d), f32),
        "ls2": jax.ShapeDtypeStruct((1, d), f32),
        "g2": jax.ShapeDtypeStruct((1, d), f32),
        "b2": jax.ShapeDtypeStruct((1, d), f32),
    }


def _mlp_bwd(x2p, dyp, p, eps, valid_len):
    """x2p/dyp: (B, Sp, D) padded. Returns dx2 (padded) + MLP param grads."""
    b, sp, d = x2p.shape
    names = ["g2", "b2", "w1", "bf1", "w2", "bf2", "ls2"]
    _, args, _ = _prep_block_args(x2p, p, names)
    xspec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    gs = _grad_shapes(p, d)
    out_names = ["w1", "bf1", "w2", "bf2", "ls2", "g2", "b2"]
    dx2, *grads = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps),
        grid=(b,),
        in_specs=[xspec, xspec] + [_CONST(a) for a in args],
        out_specs=[xspec] + [_CONST(gs[n]) for n in out_names],
        out_shape=[jax.ShapeDtypeStruct((b, sp, d), x2p.dtype)]
        + [gs[n] for n in out_names],
        interpret=_dispatch_target()[0] != "tpu",
    )(x2p, dyp, *args)
    return dx2, dict(zip(out_names, grads))


def _attn_bwd(xp, dx2p, p, num_heads, eps, valid_len):
    """xp/dx2p: (B, Sp, D) padded. Returns dx (padded) + attention grads."""
    b, sp, d = xp.shape
    names = ["g1", "b1", "wqkv", "bqkv", "wo", "bo", "ls1"]
    _, args, _ = _prep_block_args(xp, p, names)
    xspec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    gs = _grad_shapes(p, d)
    out_names = ["wqkv", "bqkv", "wo", "bo", "ls1", "g1", "b1"]
    dx, *grads = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, num_heads=num_heads, eps=eps, valid_len=valid_len
        ),
        grid=(b,),
        in_specs=[xspec, xspec] + [_CONST(a) for a in args],
        out_specs=[xspec] + [_CONST(gs[n]) for n in out_names],
        out_shape=[jax.ShapeDtypeStruct((b, sp, d), xp.dtype)]
        + [gs[n] for n in out_names],
        interpret=_dispatch_target()[0] != "tpu",
    )(xp, dx2p, *args)
    return dx, dict(zip(out_names, grads))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_block_train(x: Array, p: BlockParams, num_heads: int, eps: float) -> Array:
    """Fully-fused transformer block: Pallas forward AND Pallas backward.

    For blocks with trainable parameters and no dropout (the reference's
    unfreeze-last-N mode). Numerically matches :func:`block_math` and its
    jax.vjp within bf16/f32 tolerance (tests/test_block_kernel.py).
    """
    y, _ = _fused_forward_train(x, p, num_heads, eps)
    return y


def _train_fwd(x, p, num_heads, eps):
    y, x2p = _fused_forward_train(x, p, num_heads, eps)
    return y, (x, x2p, p)


def _train_bwd(num_heads, eps, residuals, dy):
    x, x2p, p = residuals
    b, s, d = x.shape
    sp = x2p.shape[1]
    dyp = jnp.pad(dy, [(0, 0), (0, sp - s), (0, 0)]) if sp != s else dy
    dx2p, mg = _mlp_bwd(x2p, dyp, p, eps, s)
    xp = jnp.pad(x, [(0, 0), (0, sp - s), (0, 0)]) if sp != s else x
    dxp, ag = _attn_bwd(xp, dx2p, p, num_heads, eps, s)
    dx = dxp[:, :s, :] if sp != s else dxp

    def like(name, grad):
        ref = getattr(p, name)
        return grad.reshape(ref.shape).astype(ref.dtype)

    dp = BlockParams(
        g1=like("g1", ag["g1"]), b1=like("b1", ag["b1"]),
        wqkv=like("wqkv", ag["wqkv"]), bqkv=like("bqkv", ag["bqkv"]),
        wo=like("wo", ag["wo"]), bo=like("bo", ag["bo"]),
        ls1=like("ls1", ag["ls1"]),
        g2=like("g2", mg["g2"]), b2=like("b2", mg["b2"]),
        w1=like("w1", mg["w1"]), bf1=like("bf1", mg["bf1"]),
        w2=like("w2", mg["w2"]), bf2=like("bf2", mg["bf2"]),
        ls2=like("ls2", mg["ls2"]),
    )
    return dx, dp


fused_block_train.defvjp(_train_fwd, _train_bwd)


_warned: set[str] = set()


def _warn_once(msg: str) -> None:
    """Trace-time notice for silent-perf downgrades (once per reason)."""
    if msg not in _warned:
        _warned.add(msg)
        print(f"dino_pose_tpu: {msg}")


def _dp_shard_mesh(batch: int, quiet_tp: bool = False):
    """The mesh to shard_map a fused kernel over, or None when the caller
    must fall back to unfused math (reason logged once). Only pure-DP
    meshes qualify here: Megatron-sharded weights would need per-layer
    all-gathers inside a whole-weight kernel. The split-half dispatches
    pass ``quiet_tp=True`` because they have their own tensor-parallel
    route (:func:`_tp_shard_mesh`) to try next."""
    platform, n_devices = _dispatch_target()
    if n_devices == 1:
        return None
    from dino_pose_tpu.ops.dispatch import target_mesh

    mesh = target_mesh()
    if mesh is None or mesh.devices.size != n_devices:
        _warn_once(
            "fused kernels downgraded to unfused math: multi-device trace "
            "without a configured mesh (core.mesh.create_mesh)"
        )
        return None
    if mesh.shape.get("model", 1) != 1:
        if not quiet_tp:
            _warn_once(
                "fused kernels downgraded to unfused math: tensor-parallel "
                "('model' axis) meshes shard the weights this kernel needs "
                "whole (the split-half dispatches run TP-fused instead)"
            )
        return None
    dp = mesh.shape.get("data", 1)
    if batch % dp:
        _warn_once(
            f"fused kernels downgraded to unfused math: batch {batch} does "
            f"not divide over the {dp}-way data axis"
        )
        return None
    return mesh


def _shard_map_dp(local_fn, mesh, x, p):
    """shard_map a (batch-row-parallel) kernel: batch over 'data', params
    replicated. check_rep=False (custom_vjp inside)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        local_fn, mesh=mesh, in_specs=(P("data"), P()), out_specs=P("data"),
        check_rep=False,
    )(x, p)


def fused_block_train_sharded(
    x: Array, p: BlockParams, num_heads: int, eps: float, mesh
) -> Array:
    """Fully-fused trainable block under a pure-DP mesh.

    Each shard's Pallas backward returns only its own batch rows'
    contribution to the (replicated) parameter gradients; the cross-shard
    sum is inserted by shard_map's transpose of the replicated ``P()``
    input — in this JAX generation that reduction happens even under
    ``check_rep=False`` (an explicit psum in the backward double-counts:
    gradients come out exactly n_shards× too large). Verified by
    tests/test_block_kernel.py::test_fused_block_train_sharded_grads.
    """
    return _shard_map_dp(
        lambda x_, p_: fused_block_train(x_, p_, num_heads, eps), mesh, x, p
    )


def fused_attn_part_sharded(
    x: Array, ap: AttnParams, num_heads: int, eps: float, mesh
) -> Array:
    """Fused attention half under a pure-DP mesh (LoRA layers). The
    backward (rarely pulled — everything below the adapter is frozen in
    production LoRA configs) runs the unfused VJP per shard; shard_map's
    transpose sums the replicated parameter cotangents (see
    :func:`fused_block_train_sharded`)."""
    return _shard_map_dp(
        lambda x_, ap_: fused_attn_part(x_, ap_, num_heads, eps), mesh, x, ap
    )


def fused_mlp_part_sharded(
    x2: Array, mp: MlpParams, eps: float, assume_frozen_weights: bool, mesh
) -> Array:
    """Fused MLP half (true Pallas backward) under a pure-DP mesh: the
    adapter's cotangent flows through dx2 per shard; parameter cotangents
    (zeros under the frozen contract) are summed by shard_map's transpose
    (see :func:`fused_block_train_sharded`)."""
    return _shard_map_dp(
        lambda x2_, mp_: fused_mlp_part(x2_, mp_, eps, assume_frozen_weights),
        mesh, x2, mp,
    )


def dispatch_block_train(x: Array, p: BlockParams, num_heads: int, eps: float) -> Array:
    """Trainable-block dispatch: fully-fused single-device, shard_map-fused
    on pure-DP meshes, unfused math otherwise (downgrade logged)."""
    platform, n_devices = _dispatch_target()
    if n_devices == 1:
        return fused_block_train(x, p, num_heads, eps)
    mesh = _dp_shard_mesh(x.shape[0])
    if mesh is not None:
        return fused_block_train_sharded(x, p, num_heads, eps, mesh)
    return block_math(x, p, num_heads=num_heads, eps=eps)


# ---------------------------------------------------------------------------
# Split kernels for the LoRA layer: the adapter (with its dropout RNG) sits
# between the attention output and the LayerScale residual, so the block is
# fused as two halves with the adapter in XLA between them. The attention
# half is forward-only fused — in every production LoRA config nothing below
# the adapter is trainable, so its backward is never pulled (fallback VJP
# through the unfused math keeps full differentiation correct regardless).
# The MLP half reuses the Pallas _mlp_bwd kernel: the adapter's cotangent
# arrives through dx2.
# ---------------------------------------------------------------------------

class AttnParams(NamedTuple):
    g1: Array
    b1: Array
    wqkv: Array
    bqkv: Array
    wo: Array
    bo: Array


class MlpParams(NamedTuple):
    g2: Array
    b2: Array
    w1: Array
    bf1: Array
    w2: Array
    bf2: Array
    ls2: Array


class AttnPartialParams(NamedTuple):
    """One TP shard's attention-half parameters: ``wqkv`` holds the shard's
    head columns (D, 3*D/tp), ``wo`` its out-projection rows (D/tp, D). The
    output bias lives OUTSIDE (applied once after the cross-shard psum)."""

    g1: Array
    b1: Array
    wqkv: Array
    bqkv: Array
    wo: Array


class MlpPartialParams(NamedTuple):
    """One TP shard's MLP-half parameters: fc1 columns (D, 4D/tp), fc2 rows
    (4D/tp, D). fc2 bias / LayerScale / residual apply after the psum."""

    g2: Array
    b2: Array
    w1: Array
    bf1: Array
    w2: Array


def attn_part_math(x: Array, ap: AttnParams, *, num_heads: int, eps: float) -> Array:
    """Unfused LN1 -> qkv -> attention -> out-projection (pre-LayerScale)."""
    from dino_pose_tpu.ops.attention import attention

    b, s, d = x.shape
    dh = d // num_heads
    h = _layernorm(x, ap.g1, ap.b1, eps)
    qkv = _dense(h, ap.wqkv, ap.bqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):
        return t.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)

    ctx = attention(split(q), split(k), split(v), scale=dh**-0.5)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
    return _dense(ctx, ap.wo, ap.bo)


def mlp_part_math(x2: Array, mp: MlpParams, *, eps: float) -> Array:
    """Unfused LN2 -> MLP -> LayerScale -> residual."""
    h = _layernorm(x2, mp.g2, mp.b2, eps)
    h = _dense(h, mp.w1, mp.bf1)
    h = jax.nn.gelu(h, approximate=False)
    h = _dense(h, mp.w2, mp.bf2)
    return x2 + h * mp.ls2.astype(h.dtype)


def attn_part_math_partial(
    x: Array, pp: AttnPartialParams, *, num_heads: int, eps: float
) -> Array:
    """Unfused math of one TP shard's attention half (local heads, no output
    bias) — the fused partial kernel's VJP fallback and parity reference."""
    b, s, _ = x.shape
    dl = pp.wqkv.shape[-1] // 3
    dh = dl // num_heads
    from dino_pose_tpu.ops.attention import attention

    h = _layernorm(x, pp.g1, pp.b1, eps)
    qkv = _dense(h, pp.wqkv, pp.bqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):
        return t.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)

    ctx = attention(split(q), split(k), split(v), scale=dh**-0.5)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, dl)
    return jnp.dot(ctx, pp.wo.astype(ctx.dtype)).astype(ctx.dtype)


def mlp_part_math_partial(x2: Array, pp: MlpPartialParams, *, eps: float) -> Array:
    """Unfused math of one TP shard's MLP half (partial fc2 product)."""
    h = _layernorm(x2, pp.g2, pp.b2, eps)
    h = _dense(h, pp.w1, pp.bf1)
    h = jax.nn.gelu(h, approximate=False)
    return jnp.dot(h, pp.w2.astype(h.dtype)).astype(h.dtype)


def _attn_half_core(
    x, g1, b1, wqkv, bqkv, wo, *, num_heads: int, eps: float, valid_len: int,
):
    """LN1 -> qkv -> attention -> out-projection PRODUCT (no output bias).

    Shared kernel body for the full half (caller adds ``bo``) and the
    tensor-parallel partial half (``bo`` is applied once, after the
    cross-shard psum). The head width comes from ``wqkv`` — on a TP shard
    the projection is (D, 3*D/tp) with ``num_heads/tp`` local heads.
    """
    dl = wqkv.shape[-1] // 3             # per-shard head width (== D unsharded)
    dh = dl // num_heads
    scale = dh**-0.5
    sp = x.shape[1]

    a = _layernorm(x, g1[0], b1[0], eps)
    qkv = (
        jax.lax.dot_general(
            a, wqkv[...], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bqkv[0].astype(x.dtype)
    )
    ctx_parts = []
    for h in range(num_heads):
        q = qkv[:, :, h * dh : (h + 1) * dh]
        k = qkv[:, :, dl + h * dh : dl + (h + 1) * dh]
        v = qkv[:, :, 2 * dl + h * dh : 2 * dl + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_len < sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
            s = jnp.where(col < valid_len, s, _NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        ctx_parts.append(
            jax.lax.dot_general(
                probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    ctx = jnp.concatenate(ctx_parts, axis=-1)
    return jax.lax.dot_general(
        ctx, wo[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _attn_part_kernel(
    x_ref, g1, b1, wqkv, bqkv, wo, bo, o_ref,
    *, num_heads: int, eps: float, valid_len: int,
):
    x = x_ref[...]                       # (G, Sp, D)
    o_ref[...] = _attn_half_core(
        x, g1, b1, wqkv, bqkv, wo,
        num_heads=num_heads, eps=eps, valid_len=valid_len,
    ) + bo[0].astype(x.dtype)


def _attn_part_partial_kernel(
    x_ref, g1, b1, wqkv, bqkv, wo, o_ref,
    *, num_heads: int, eps: float, valid_len: int,
):
    """TP shard's attention half: local heads, partial out-projection sum."""
    o_ref[...] = _attn_half_core(
        x_ref[...], g1, b1, wqkv, bqkv, wo,
        num_heads=num_heads, eps=eps, valid_len=valid_len,
    )


def _mlp_part_kernel(
    x2_ref, g2, b2, w1, bf1, w2, bf2, ls2, y_ref, *, eps: float,
):
    x2 = x2_ref[...]                     # (G, Sp, D)
    m = _layernorm(x2, g2[0], b2[0], eps)
    h1 = (
        jax.lax.dot_general(
            m, w1[...], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x2.dtype)
        + bf1[0].astype(x2.dtype)
    )
    h1 = _gelu_exact(h1)
    h2 = (
        jax.lax.dot_general(
            h1, w2[...], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x2.dtype)
        + bf2[0].astype(x2.dtype)
    )
    y_ref[...] = x2 + h2 * ls2[0].astype(x2.dtype)


def _mlp_dx_kernel(
    x2_ref, dy_ref, g2, b2, w1, bf1, w2, bf2, ls2, dx2_ref, *, eps: float,
):
    """Activation-only backward of the MLP half: dx2 without the weight
    gradients (frozen-weight LoRA layers discard them anyway). Subset of
    :func:`_mlp_bwd_kernel`; no accumulators, so programs are independent."""
    x2 = x2_ref[0]                                    # (Sp, D) bf16
    dy = dy_ref[0].astype(jnp.float32)
    dt = x2.dtype
    m, xhat2, r2 = _ln_fwd_stats(x2, g2[0], b2[0], eps)
    h1 = (_mm(m, w1[...], (1,), (0,)).astype(dt) + bf1[0].astype(dt))
    dh2b = (dy * ls2[0]).astype(dt)
    dg = _mm(dh2b, w2[...], (1,), (1,)).astype(jnp.float32)
    dh1b = (dg * _gelu_grad(h1.astype(jnp.float32))).astype(dt)
    dm = _mm(dh1b, w1[...], (1,), (1,)).astype(jnp.float32)
    dx2_ref[0] = (dy + _ln_bwd_dx(dm, xhat2, r2, g2[0])).astype(dt)


def _mlp_part_partial_kernel(
    x2_ref, g2, b2, w1, bf1, w2, y_ref, *, eps: float,
):
    """TP shard's MLP half: partial fc2 product (bias/LayerScale/residual
    apply once, outside the psum)."""
    x2 = x2_ref[...]                     # (G, Sp, D)
    m = _layernorm(x2, g2[0], b2[0], eps)
    h1 = (
        jax.lax.dot_general(
            m, w1[...], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x2.dtype)
        + bf1[0].astype(x2.dtype)
    )
    h1 = _gelu_exact(h1)
    y_ref[...] = jax.lax.dot_general(
        h1, w2[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x2.dtype)


def _mlp_dx_fits(sp: int, d: int, itemsize: int, hidden: int | None = None) -> bool:
    """Conservative scoped-VMEM model for the RESIDENT activation-only dx
    kernels (:func:`_mlp_dx_kernel` / :func:`_mlp_partial_dx_kernel`):
    2x-buffered x2/dy/dx2 pipeline blocks, resident fc1+fc2 (constant-index
    blocks are single-buffered), f32 LN stats, and the (Sp, hidden)
    native+f32 intermediates. At D=768 this comes to ~20 MiB — past
    Mosaic's 16 MiB stack (a compiler report measured 19.32 MiB), so the
    frozen backward must stream instead (see ``_mlp_part_bwd``)."""
    h = 4 * d if hidden is None else hidden
    i = itemsize
    streams = 6 * sp * d * i
    weights = 2 * d * h * i
    temps = sp * d * (i + 8) + sp * h * (2 * i + 4)
    return streams + weights + temps <= 15 * 1024 * 1024


def _mlp_partial_dx_kernel(
    x2_ref, dp_ref, g2, b2, w1, bf1, w2, dx2_ref, *, eps: float,
):
    """Activation-only backward of a TP shard's partial MLP half: the
    cotangent ``dp`` arrives already scaled by the external LayerScale
    chain, and the residual's identity term is added by autodiff outside —
    only the LN -> fc1 -> gelu -> fc2 path is inverted here."""
    x2 = x2_ref[0]                                    # (Sp, D)
    dp = dp_ref[0]
    dt = x2.dtype
    m, xhat2, r2 = _ln_fwd_stats(x2, g2[0], b2[0], eps)
    h1 = (_mm(m, w1[...], (1,), (0,)).astype(dt) + bf1[0].astype(dt))
    dg = _mm(dp.astype(dt), w2[...], (1,), (1,)).astype(jnp.float32)
    dh1b = (dg * _gelu_grad(h1.astype(jnp.float32))).astype(dt)
    dm = _mm(dh1b, w1[...], (1,), (1,)).astype(jnp.float32)
    dx2_ref[0] = _ln_bwd_dx(dm, xhat2, r2, g2[0]).astype(dt)


def _part_call(kernel, x, args, sp, g):
    b, _, d = x.shape
    xspec = pl.BlockSpec((g, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[xspec] + [_CONST(a) for a in args],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        interpret=_dispatch_target()[0] != "tpu",
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_attn_part(x: Array, ap: AttnParams, num_heads: int, eps: float) -> Array:
    """Fused attention half (forward); backward falls back to unfused math
    (never pulled when everything below the adapter is frozen)."""
    b, s, d = x.shape
    xp, args, sp = _prep_block_args(x, ap, list(AttnParams._fields))
    g = _part_rows(sp, d, x.dtype.itemsize, b)
    out = _part_call(
        functools.partial(
            _attn_part_kernel, num_heads=num_heads, eps=eps, valid_len=s
        ),
        xp, args, sp, g,
    )(xp, *args)
    return out[:, :s, :] if sp != s else out


def _attn_part_fwd(x, ap, num_heads, eps):
    return fused_attn_part(x, ap, num_heads, eps), (x, ap)


def _attn_part_bwd(num_heads, eps, residuals, dy):
    x, ap = residuals
    _, vjp = jax.vjp(
        lambda x_, ap_: attn_part_math(x_, ap_, num_heads=num_heads, eps=eps),
        x, ap,
    )
    return vjp(dy)


fused_attn_part.defvjp(_attn_part_fwd, _attn_part_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_mlp_part(
    x2: Array, mp: MlpParams, eps: float, assume_frozen_weights: bool = False
) -> Array:
    """Fused MLP half with a true Pallas backward: the input cotangent dx2
    carries the adapter's gradient path.

    ``assume_frozen_weights=True`` switches the backward to an
    activation-only kernel that returns ZERO weight cotangents — only valid
    when the caller guarantees the MLP parameters are never differentiated
    (the LoRA configs' partition freezes the whole backbone, reference
    dinov2_pose.py:176-204 semantics). dx2 is exact either way."""
    b, s, d = x2.shape
    x2p, args, sp = _prep_block_args(x2, mp, list(MlpParams._fields))
    g = _part_rows(sp, d, x2.dtype.itemsize, b, hidden=mp.w1.shape[-1])
    out = _part_call(
        functools.partial(_mlp_part_kernel, eps=eps), x2p, args, sp, g
    )(x2p, *args)
    return out[:, :s, :] if sp != s else out


def _mlp_part_fwd(x2, mp, eps, assume_frozen_weights=False):
    return fused_mlp_part(x2, mp, eps, assume_frozen_weights), (x2, mp)


def _mlp_part_bwd(eps, assume_frozen_weights, residuals, dy):
    x2, mp = residuals
    b, s, d = x2.shape
    sp = -(-s // 8) * 8
    pad = [(0, 0), (0, sp - s), (0, 0)]
    x2p = jnp.pad(x2, pad) if sp != s else x2
    dyp = jnp.pad(dy, pad) if sp != s else dy

    if assume_frozen_weights:
        if not _mlp_dx_fits(sp, d, x2.dtype.itemsize, hidden=mp.w1.shape[-1]):
            # The resident dx kernel's working set exceeds scoped VMEM at
            # D >= 768; the STREAMING activation-only dx kernel computes the
            # identical backward (fused_mlp_part and fused_mlp_part_stream
            # share the y = x2 + ls2*(fc2(gelu(fc1(LN(x2)))) + bf2) math).
            return _mlp_stream_bwd(eps, True, (x2, mp, None), dy)
        _, args, _ = _prep_block_args(x2p, mp, list(MlpParams._fields))
        xspec = pl.BlockSpec(
            (1, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        dx2p = pl.pallas_call(
            functools.partial(_mlp_dx_kernel, eps=eps),
            grid=(b,),
            in_specs=[xspec, xspec] + [_CONST(a) for a in args],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct((b, sp, d), x2p.dtype),
            interpret=_dispatch_target()[0] != "tpu",
        )(x2p, dyp, *args)
        dmp = jax.tree.map(jnp.zeros_like, mp)  # frozen by caller contract
    elif mp.w1.shape[-1] != 4 * d:
        # _mlp_bwd's grad accumulators (_grad_shapes) are ratio-4 by
        # construction; exact unfused fallback for other fc1 widths.
        _, vjp = jax.vjp(lambda x_, mp_: mlp_part_math(x_, mp_, eps=eps), x2, mp)
        return vjp(dy)
    else:
        dx2p, g = _mlp_bwd(x2p, dyp, mp, eps, s)

        def like(name):
            ref = getattr(mp, name)
            return g[name].reshape(ref.shape).astype(ref.dtype)

        dmp = MlpParams(
            g2=like("g2"), b2=like("b2"), w1=like("w1"), bf1=like("bf1"),
            w2=like("w2"), bf2=like("bf2"), ls2=like("ls2"),
        )
    dx2 = dx2p[:, :s, :] if sp != s else dx2p
    return dx2, dmp


fused_mlp_part.defvjp(_mlp_part_fwd, _mlp_part_bwd)


# ---------------------------------------------------------------------------
# Tensor-parallel split halves: on a ('data', 'model') mesh each model shard
# runs the fused half kernel on ITS Megatron slice — local head columns for
# attention, local fc1 columns / fc2 rows for the MLP — producing a partial
# out-projection sum; one psum over 'model' per half stitches the residual
# branch (the same single-all-reduce-per-branch layout core/sharding.py's
# pjit rules give the unfused path, but with the Pallas kernels kept).
# Output bias / LayerScale / residual apply once, outside the psum.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_attn_part_partial(
    x: Array, pp: AttnPartialParams, num_heads: int, eps: float
) -> Array:
    """Fused attention half on one TP shard: ``num_heads`` LOCAL heads,
    partial (pre-psum, pre-bias) out-projection product. Backward falls
    back to the unfused partial math (never pulled when everything below
    the adapter is frozen)."""
    b, s, d = x.shape
    xp, args, sp = _prep_block_args(x, pp, list(AttnPartialParams._fields))
    g = _part_rows(sp, d, x.dtype.itemsize, b)
    out = _part_call(
        functools.partial(
            _attn_part_partial_kernel, num_heads=num_heads, eps=eps, valid_len=s
        ),
        xp, args, sp, g,
    )(xp, *args)
    return out[:, :s, :] if sp != s else out


def _attn_partial_fwd(x, pp, num_heads, eps):
    return fused_attn_part_partial(x, pp, num_heads, eps), (x, pp)


def _attn_partial_bwd(num_heads, eps, residuals, dy):
    x, pp = residuals
    _, vjp = jax.vjp(
        lambda x_, pp_: attn_part_math_partial(
            x_, pp_, num_heads=num_heads, eps=eps
        ),
        x, pp,
    )
    return vjp(dy)


fused_attn_part_partial.defvjp(_attn_partial_fwd, _attn_partial_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_mlp_part_partial(
    x2: Array, pp: MlpPartialParams, eps: float, assume_frozen_weights: bool = False
) -> Array:
    """Fused MLP half on one TP shard (partial fc2 product).

    ``assume_frozen_weights=True`` backward runs the activation-only partial
    dx kernel (zero weight cotangents — the LoRA frozen-backbone contract);
    otherwise jax.vjp of the unfused partial math."""
    b, s, d = x2.shape
    x2p, args, sp = _prep_block_args(x2, pp, list(MlpPartialParams._fields))
    g = _part_rows(sp, d, x2.dtype.itemsize, b, hidden=pp.w1.shape[-1])
    out = _part_call(
        functools.partial(_mlp_part_partial_kernel, eps=eps), x2p, args, sp, g
    )(x2p, *args)
    return out[:, :s, :] if sp != s else out


def _mlp_partial_fwd(x2, pp, eps, assume_frozen_weights=False):
    return fused_mlp_part_partial(x2, pp, eps, assume_frozen_weights), (x2, pp)


def _mlp_partial_bwd(eps, assume_frozen_weights, residuals, dp):
    x2, pp = residuals
    b, s, d = x2.shape
    sp = -(-s // 8) * 8
    if not assume_frozen_weights or not _mlp_dx_fits(
        sp, d, x2.dtype.itemsize, hidden=pp.w1.shape[-1]
    ):
        # Unfrozen weights need full cotangents; oversized resident dx
        # working sets (D=1024 at tp=2) take the exact unfused VJP too.
        _, vjp = jax.vjp(
            lambda x_, pp_: mlp_part_math_partial(x_, pp_, eps=eps), x2, pp
        )
        return vjp(dp)
    pad = [(0, 0), (0, sp - s), (0, 0)]
    x2p = jnp.pad(x2, pad) if sp != s else x2
    dpp = jnp.pad(dp, pad) if sp != s else dp
    _, args, _ = _prep_block_args(x2p, pp, list(MlpPartialParams._fields))
    xspec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dx2p = pl.pallas_call(
        functools.partial(_mlp_partial_dx_kernel, eps=eps),
        grid=(b,),
        in_specs=[xspec, xspec] + [_CONST(a) for a in args],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x2p.dtype),
        interpret=_dispatch_target()[0] != "tpu",
    )(x2p, dpp, *args)
    dx2 = dx2p[:, :s, :] if sp != s else dx2p
    return dx2, jax.tree.map(jnp.zeros_like, pp)


fused_mlp_part_partial.defvjp(_mlp_partial_fwd, _mlp_partial_bwd)


def attn_part_tp(
    x: Array, ap: AttnParams, num_heads: int, eps: float, mesh
) -> Array:
    """Attention half over a ('data', 'model') mesh: heads over 'model',
    batch over 'data', one psum per layer."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape["model"]
    wq, wk, wv = jnp.split(ap.wqkv, 3, axis=1)
    bq, bk, bv = jnp.split(ap.bqkv, 3)

    def local(x_l, wq_l, wk_l, wv_l, bq_l, bk_l, bv_l, wo_l, g1, b1):
        pp = AttnPartialParams(
            g1=g1, b1=b1,
            wqkv=jnp.concatenate([wq_l, wk_l, wv_l], axis=1),
            bqkv=jnp.concatenate([bq_l, bk_l, bv_l]),
            wo=wo_l,
        )
        part = fused_attn_part_partial(x_l, pp, num_heads // tp, eps)
        return jax.lax.psum(part, "model")

    o = shard_map(
        local, mesh=mesh,
        in_specs=(
            P("data"),
            P(None, "model"), P(None, "model"), P(None, "model"),
            P("model"), P("model"), P("model"),
            P("model", None), P(), P(),
        ),
        out_specs=P("data"),
        check_rep=False,  # custom_vjp inside
    )(x, wq, wk, wv, bq, bk, bv, ap.wo, ap.g1, ap.b1)
    return o + ap.bo.astype(o.dtype)


def mlp_part_tp(
    x2: Array, mp: MlpParams, eps: float, assume_frozen_weights: bool, mesh
) -> Array:
    """MLP half over a ('data', 'model') mesh: fc1 columns / fc2 rows over
    'model', batch over 'data', one psum per layer."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(x2_l, w1_l, bf1_l, w2_l, g2, b2):
        pp = MlpPartialParams(g2=g2, b2=b2, w1=w1_l, bf1=bf1_l, w2=w2_l)
        part = fused_mlp_part_partial(x2_l, pp, eps, assume_frozen_weights)
        return jax.lax.psum(part, "model")

    h2 = shard_map(
        local, mesh=mesh,
        in_specs=(
            P("data"), P(None, "model"), P("model"), P("model", None),
            P(), P(),
        ),
        out_specs=P("data"),
        check_rep=False,
    )(x2, mp.w1, mp.bf1, mp.w2, mp.g2, mp.b2)
    h2 = h2 + mp.bf2.astype(h2.dtype)
    return x2 + h2 * mp.ls2.astype(h2.dtype)


def _tp_shard_mesh(batch: int, *, heads: int | None = None, hidden: int | None = None):
    """The ('data', 'model') mesh for tensor-parallel split-half dispatch,
    or None when the shapes do not divide (reason logged once). Attention
    callers pass ``heads`` (heads must divide over 'model'); MLP callers
    pass ``hidden`` — the ACTUAL fc1 width (w1.shape[-1]), which must
    divide over 'model' for the Megatron column/row split."""
    platform, n_devices = _dispatch_target()
    if n_devices <= 1:
        return None
    from dino_pose_tpu.ops.dispatch import target_mesh

    mesh = target_mesh()
    if mesh is None or mesh.devices.size != n_devices:
        return None
    tp = mesh.shape.get("model", 1)
    if tp == 1:
        return None  # pure DP is the _dp_shard_mesh path
    dp = mesh.shape.get("data", 1)
    bad = batch % dp
    bad = bad or (heads is not None and heads % tp)
    bad = bad or (hidden is not None and hidden % tp)
    if bad:
        _warn_once(
            "fused TP halves downgraded to unfused math: "
            f"batch {batch} / heads {heads} / hidden {hidden} do not "
            f"divide over the {dp}x{tp} mesh"
        )
        return None
    return mesh


def dispatch_attn_part(x, ap: AttnParams, num_heads: int, eps: float) -> Array:
    platform, n_devices = _dispatch_target()
    if n_devices == 1:
        return fused_attn_part(x, ap, num_heads, eps)
    mesh = _dp_shard_mesh(x.shape[0], quiet_tp=True)
    if mesh is not None:
        return fused_attn_part_sharded(x, ap, num_heads, eps, mesh)
    tpm = _tp_shard_mesh(x.shape[0], heads=num_heads)
    if tpm is not None:
        return attn_part_tp(x, ap, num_heads, eps, tpm)
    return attn_part_math(x, ap, num_heads=num_heads, eps=eps)


def dispatch_mlp_part(
    x2, mp: MlpParams, eps: float, assume_frozen_weights: bool = False
) -> Array:
    platform, n_devices = _dispatch_target()
    if n_devices == 1:
        return fused_mlp_part(x2, mp, eps, assume_frozen_weights)
    mesh = _dp_shard_mesh(x2.shape[0], quiet_tp=True)
    if mesh is not None:
        return fused_mlp_part_sharded(x2, mp, eps, assume_frozen_weights, mesh)
    tpm = _tp_shard_mesh(x2.shape[0], hidden=mp.w1.shape[-1])
    if tpm is not None:
        return mlp_part_tp(x2, mp, eps, assume_frozen_weights, tpm)
    return mlp_part_math(x2, mp, eps=eps)


# ---------------------------------------------------------------------------
# Weight-STREAMING split kernels for backbones whose half-weights exceed VMEM
# (dinov2-large, D=1024: fc1+fc2 alone are 16.8 MB bf16). The activations and
# an f32 accumulator stay resident in VMEM/scratch across the inner grid
# dimension while weight blocks stream through:
#   - MLP half: fc1 column blocks + fc2 row blocks over the 4D hidden axis;
#   - attention half: per-head q/k/v column slices + output-projection row
#     slices over the head axis.
# Per layer, HBM traffic becomes: read x once, write y once, read the weights
# (B / rows_per_program) times — vs the unfused XLA path's ~10 full-size
# activation round-trips per layer. Forward-only (frozen/inference layers and
# the LoRA configs); the MLP half also has a streaming activation-only dx
# kernel so the LoRA adapter's cotangent path stays in Pallas.
# ---------------------------------------------------------------------------

# Mosaic's scoped-vmem stack limit is 16 MiB; every pipelined block is
# DOUBLE-buffered (next block prefetches while the current one computes),
# so streamed weights and (g, Sp, D) activation blocks count twice, while
# scratch and in-kernel temporaries count once. The size models below are
# calibrated against two hardware compiler reports (estimate ~1.15x the
# reported scoped allocation, so a 16 MiB budget keeps real usage < 14.5):
#   - fwd  f32 D=768  (g=1, bh=1024): reported 17.12 MiB, model 20.4 MiB
#   - dx   bf16 D=1024 (g=2, bh=512): reported 18.89 MiB, model 21.5 MiB
# The dx kernel streams one extra (g, Sp, D) input (dy) and carries more
# f32 temporaries, so it gets its OWN plan — forward and backward
# pallas_calls do not need matching grids.
_STREAM_VMEM_BUDGET = 16 * 1024 * 1024


def _stream_mlp_bytes(
    g: int, bh: int, sp: int, d: int, itemsize: int, dx: bool = False
) -> int:
    """Scoped-VMEM bytes model for a streaming-MLP plan.

    Forward: 2x-buffered x2 + y, LN scratch (itemsize) + f32 accumulator +
    f32 LN temp, the (g*Sp, bh) hidden block in native + f32 precision, and
    2x-buffered fc1/fc2 blocks. The dx variant adds the 2x-buffered dy
    stream, its f32 upcast, and a second f32 hidden-block temporary."""
    i = itemsize
    per_elem = (7 * i + 12) if dx else (5 * i + 8)
    per_hidden = (2 * i + 8) if dx else (i + 4)
    acts = g * sp * d * per_elem + g * sp * bh * per_hidden
    weights = 4 * d * bh * i
    return acts + weights


def _stream_mlp_plan(
    sp: int, d: int, itemsize: int, batch: int, dx: bool = False,
    hidden: int | None = None,
):
    """(rows_per_program g, hidden block bh) for the streaming MLP kernel,
    or None when nothing fits. Larger g amortises weight re-reads; larger bh
    means fewer (bigger) MXU calls per block. ``hidden`` is the actual fc1
    width (w1.shape[-1]); None assumes the DINOv2 ratio-4 default."""
    hidden = 4 * d if hidden is None else hidden
    for g in (8, 4, 2, 1):
        if batch % g:
            continue
        for bh in (2048, 1024, 512, 256):
            if hidden % bh:
                continue
            if _stream_mlp_bytes(g, bh, sp, d, itemsize, dx) <= _STREAM_VMEM_BUDGET:
                return g, bh
    return None


def _stream_mlp_dw_bytes(g: int, bh: int, sp: int, d: int, itemsize: int) -> int:
    """Scoped-VMEM bytes model for the hidden-block-major dw pass:
    2x-buffered x2 + dy streams with f32 upcasts and LN temporaries, the
    (g*Sp, bh) hidden block in native + two f32 precisions (h1 recompute,
    gelu-grad product), 2x-buffered w1/w2 blocks, and the RESIDENT f32
    dw1/dw2 gradient blocks (counted 2x for the flush buffer)."""
    i = itemsize
    acts = g * sp * d * (4 * i + 12) + g * sp * bh * (2 * i + 12)
    weights = 4 * d * bh * i
    grads = 16 * d * bh + 8 * bh
    return acts + weights + grads


def _stream_mlp_dw_plan(sp: int, d: int, itemsize: int, batch: int, hidden: int):
    """(rows_per_program g, hidden block bh) for the streaming dw kernel,
    or None when nothing fits. Larger g amortises the per-block activation
    re-reads; bh trades weight-block residency against MXU call size."""
    for g in (8, 4, 2, 1):
        if batch % g:
            continue
        for bh in (2048, 1024, 512, 256, 128):
            if hidden % bh:
                continue
            if _stream_mlp_dw_bytes(g, bh, sp, d, itemsize) <= _STREAM_VMEM_BUDGET:
                return g, bh
    return None


def _attn_heads_per_block(num_heads: int, dh: int) -> int | None:
    """Heads per streamed weight block: Mosaic needs the block's lane
    (last) dimension divisible by 128, so groups of ceil(128/dh) heads
    stream together."""
    hpb = max(1, -(-128 // dh))
    while hpb <= num_heads and (num_heads % hpb or (hpb * dh) % 128):
        hpb += 1
    return hpb if hpb <= num_heads else None


def _stream_attn_plan(
    sp: int, d: int, dh: int, itemsize: int, batch: int, num_heads: int
):
    """(rows_per_program g, heads_per_block) for the head-streaming
    attention kernel, or None."""
    hpb = _attn_heads_per_block(num_heads, dh)
    if hpb is None:
        return None
    for g in (8, 4, 2, 1):
        if batch % g:
            continue
        if _stream_attn_bytes(g, hpb, sp, d, dh, itemsize) <= _STREAM_VMEM_BUDGET:
            return g, hpb
    return None


def _stream_attn_bytes(
    g: int, hpb: int, sp: int, d: int, dh: int, itemsize: int
) -> int:
    """Worst-case scoped-VMEM bytes for a streaming-attention plan:
    2x-buffered x + o, LN scratch + f32 accumulator, f32 score tile,
    q/k/v/ctx group temporaries, 2x-buffered qkv-column + out-row weight
    slices (see _stream_mlp_bytes for the buffering model)."""
    gw = hpb * dh
    acts = g * sp * d * (5 * itemsize + 8) + g * sp * sp * 4 \
        + 8 * g * sp * gw * itemsize
    weights = 8 * d * gw * itemsize
    return acts + weights


def _stream_attn_bwd_bytes(
    g: int, hpb: int, sp: int, d: int, dh: int, itemsize: int, dw: bool
) -> int:
    """Scoped-VMEM bytes model for the streaming attention backward passes.

    Both recompute the group projections and per-head probabilities: x + dy
    streams (2x-buffered) with f32 upcasts, LN scratch (+ f32 da accumulator
    in the dx pass), three live (g, Sp, Sp) f32 score-class tiles (s/probs,
    dp, ds), and ~7 (g, Sp, gw) group tensors (q/k/v, dctx, dq/dk/dv — plus
    ctx in the dw pass). The dw pass swaps the da accumulator for the
    RESIDENT f32 gradient blocks (3 qkv-column + 1 out-row, counted 2x for
    the flush buffer)."""
    i = itemsize
    gw = hpb * dh
    acts = g * sp * d * (7 * i + 16) + 3 * g * sp * sp * 4 \
        + g * sp * gw * (8 if dw else 7) * (i + 2)
    weights = 8 * d * gw * i
    grads = 32 * d * gw if dw else 0
    return acts + weights + grads


def _stream_attn_bwd_plan(
    sp: int, d: int, dh: int, itemsize: int, batch: int, num_heads: int,
    dw: bool,
):
    """(rows_per_program g, heads_per_block) for a streaming attention
    backward pass, or None when nothing fits."""
    hpb = _attn_heads_per_block(num_heads, dh)
    if hpb is None:
        return None
    for g in (8, 4, 2, 1):
        if batch % g:
            continue
        if _stream_attn_bwd_bytes(g, hpb, sp, d, dh, itemsize, dw) \
                <= _STREAM_VMEM_BUDGET:
            return g, hpb
    return None


def _mlp_stream_kernel(
    x2_ref, g2, b2, w1_ref, bf1_ref, w2_ref, bf2, ls2,
    y_ref, m_ref, acc_ref, *, eps: float, n_blocks: int,
):
    j = pl.program_id(1)
    x2 = x2_ref[...]                                   # (g, Sp, D)
    dt = x2.dtype
    gg, sp, d = x2.shape

    @pl.when(j == 0)
    def _init():
        m_ref[...] = _layernorm(x2, g2[0], b2[0], eps)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m2 = m_ref[...].reshape(gg * sp, d)
    h1 = (
        _mm(m2, w1_ref[...], (1,), (0,)).astype(dt) + bf1_ref[0].astype(dt)
    )
    h1 = _gelu_exact(h1)
    acc_ref[...] += _mm(h1, w2_ref[...], (1,), (0,)).reshape(gg, sp, d)

    @pl.when(j == n_blocks - 1)
    def _fin():
        h2 = acc_ref[...] + bf2[0]
        y_ref[...] = x2 + (h2 * ls2[0]).astype(dt)


def _mlp_stream_dx_kernel(
    x2_ref, dy_ref, g2, b2, w1_ref, bf1_ref, w2_ref, ls2,
    dx2_ref, m_ref, acc_ref, *, eps: float, n_blocks: int,
):
    """Streaming activation-only backward of the MLP half: dx2 without
    weight cotangents (frozen-weight LoRA layers discard them)."""
    j = pl.program_id(1)
    x2 = x2_ref[...]
    dy = dy_ref[...].astype(jnp.float32)               # (g, Sp, D)
    dt = x2.dtype
    gg, sp, d = x2.shape

    @pl.when(j == 0)
    def _init():
        m_ref[...] = _layernorm(x2, g2[0], b2[0], eps)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m2 = m_ref[...].reshape(gg * sp, d)
    h1 = (
        _mm(m2, w1_ref[...], (1,), (0,)).astype(dt) + bf1_ref[0].astype(dt)
    )
    dh2b = (dy * ls2[0]).astype(dt).reshape(gg * sp, d)
    dg = _mm(dh2b, w2_ref[...], (1,), (1,))            # (g*Sp, bh) f32
    dh1 = (dg * _gelu_grad(h1.astype(jnp.float32))).astype(dt)
    acc_ref[...] += _mm(dh1, w1_ref[...], (1,), (1,)).reshape(gg, sp, d)

    @pl.when(j == n_blocks - 1)
    def _fin():
        _, xhat2, r2 = _ln_fwd_stats(x2, g2[0], b2[0], eps)
        dx2_ref[...] = (dy + _ln_bwd_dx(acc_ref[...], xhat2, r2, g2[0])).astype(dt)


def _mlp_stream_train_kernel(
    x2_ref, g2, b2, w1_ref, bf1_ref, w2_ref, bf2, ls2,
    y_ref, h2_ref, m_ref, acc_ref, *, eps: float, n_blocks: int,
):
    """Forward + saved pre-LayerScale output ``h2`` (the residual the full
    streaming backward needs for the LayerScale cotangent; bf16, matching
    the non-streaming ``_mlp_bwd_kernel``'s recomputed-h2 precision)."""
    j = pl.program_id(1)
    x2 = x2_ref[...]                                   # (g, Sp, D)
    dt = x2.dtype
    gg, sp, d = x2.shape

    @pl.when(j == 0)
    def _init():
        m_ref[...] = _layernorm(x2, g2[0], b2[0], eps)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m2 = m_ref[...].reshape(gg * sp, d)
    h1 = (
        _mm(m2, w1_ref[...], (1,), (0,)).astype(dt) + bf1_ref[0].astype(dt)
    )
    h1 = _gelu_exact(h1)
    acc_ref[...] += _mm(h1, w2_ref[...], (1,), (0,)).reshape(gg, sp, d)

    @pl.when(j == n_blocks - 1)
    def _fin():
        h2 = acc_ref[...] + bf2[0]
        h2_ref[...] = h2.astype(dt)
        y_ref[...] = x2 + (h2 * ls2[0]).astype(dt)


def _mlp_stream_dx_full_kernel(
    x2_ref, dy_ref, g2, b2, w1_ref, bf1_ref, w2_ref, ls2,
    dx2_ref, dg2_ref, db2_ref, m_ref, acc_ref, *, eps: float, n_blocks: int,
):
    """Streaming backward dx pass WITH the LayerNorm parameter cotangents:
    identical dataflow to ``_mlp_stream_dx_kernel`` plus (1, D) f32
    accumulators for dgamma2/dbeta2 (constant-index outputs stay resident
    for the whole grid, so cross-row accumulation at j == n_blocks-1 is
    safe)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    x2 = x2_ref[...]
    dy = dy_ref[...].astype(jnp.float32)               # (g, Sp, D)
    dt = x2.dtype
    gg, sp, d = x2.shape

    @pl.when(j == 0)
    def _init():
        m_ref[...] = _layernorm(x2, g2[0], b2[0], eps)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m2 = m_ref[...].reshape(gg * sp, d)
    h1 = (
        _mm(m2, w1_ref[...], (1,), (0,)).astype(dt) + bf1_ref[0].astype(dt)
    )
    dh2b = (dy * ls2[0]).astype(dt).reshape(gg * sp, d)
    dg = _mm(dh2b, w2_ref[...], (1,), (1,))            # (g*Sp, bh) f32
    dh1 = (dg * _gelu_grad(h1.astype(jnp.float32))).astype(dt)
    acc_ref[...] += _mm(dh1, w1_ref[...], (1,), (1,)).reshape(gg, sp, d)

    @pl.when((j == n_blocks - 1) & (i == 0))
    def _init_ln():
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    @pl.when(j == n_blocks - 1)
    def _fin():
        dm = acc_ref[...]
        _, xhat2, r2 = _ln_fwd_stats(x2, g2[0], b2[0], eps)
        dg2_ref[...] += jnp.sum(dm * xhat2, axis=(0, 1))[None, :]
        db2_ref[...] += jnp.sum(dm, axis=(0, 1))[None, :]
        dx2_ref[...] = (dy + _ln_bwd_dx(dm, xhat2, r2, g2[0])).astype(dt)


def _mlp_stream_dw_kernel(
    x2_ref, dy_ref, g2, b2, w1_ref, bf1_ref, w2_ref, ls2,
    dw1_ref, dbf1_ref, dw2_ref, *, eps: float, n_blocks: int,
):
    """Streaming weight-cotangent pass: hidden-block-MAJOR grid
    ``(n_blocks, B/g)`` so each (D, bh)/(bh, D) gradient block's index map is
    invariant over the inner row sweep — it stays resident in VMEM while
    every batch row streams through, is written out once per hidden block,
    and is never revisited (Mosaic-safe accumulation). Activations re-stream
    per hidden block; weight traffic is read-once per block."""
    i = pl.program_id(1)
    x2 = x2_ref[...]
    dy = dy_ref[...].astype(jnp.float32)
    dt = x2.dtype
    gg, sp, d = x2.shape

    m2 = _layernorm(x2, g2[0], b2[0], eps).reshape(gg * sp, d)
    h1 = (
        _mm(m2, w1_ref[...], (1,), (0,)).astype(dt) + bf1_ref[0].astype(dt)
    )
    act = _gelu_exact(h1)
    dp = (dy * ls2[0]).astype(dt).reshape(gg * sp, d)
    dg = _mm(dp, w2_ref[...], (1,), (1,))              # (g*Sp, bh) f32
    dh1 = dg * _gelu_grad(h1.astype(jnp.float32))
    dh1b = dh1.astype(dt)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dbf1_ref[...] = jnp.zeros_like(dbf1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    dw1_ref[...] += _mm(m2, dh1b, (0,), (0,))          # (D, bh) f32
    dbf1_ref[...] += jnp.sum(dh1, axis=0)[None, :]
    dw2_ref[...] += _mm(act, dp, (0,), (0,))           # (bh, D) f32


def _attn_stream_kernel(
    x_ref, g1, b1, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, bo,
    o_ref, a_ref, acc_ref,
    *, heads_per_block: int, n_groups: int, eps: float, valid_len: int,
):
    hg = pl.program_id(1)
    x = x_ref[...]                                     # (g, Sp, D)
    dt = x.dtype
    gg, sp, d = x.shape
    gw = wq_ref.shape[1]                               # heads_per_block * dh
    dh = gw // heads_per_block
    scale = dh**-0.5

    @pl.when(hg == 0)
    def _init():
        a_ref[...] = _layernorm(x, g1[0], b1[0], eps)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a2 = a_ref[...].reshape(gg * sp, d)

    def group_proj(w_ref, b_ref):
        return (
            _mm(a2, w_ref[...], (1,), (0,)).astype(dt) + b_ref[0].astype(dt)
        ).reshape(gg, sp, gw)

    qg = group_proj(wq_ref, bq_ref)
    kg = group_proj(wk_ref, bk_ref)
    vg = group_proj(wv_ref, bv_ref)
    ctx_parts = []
    for t in range(heads_per_block):
        q = qg[:, :, t * dh : (t + 1) * dh]
        k = kg[:, :, t * dh : (t + 1) * dh]
        v = vg[:, :, t * dh : (t + 1) * dh]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                      # (g, Sp, Sp) f32
        if valid_len < sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
            s = jnp.where(col < valid_len, s, _NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ctx_parts.append(
            jax.lax.dot_general(
                probs, v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dt)                               # (g, Sp, dh)
        )
    ctx = jnp.concatenate(ctx_parts, axis=-1)          # (g, Sp, gw)
    acc_ref[...] += _mm(
        ctx.reshape(gg * sp, gw), wo_ref[...], (1,), (0,)
    ).reshape(gg, sp, d)

    @pl.when(hg == n_groups - 1)
    def _fin():
        o_ref[...] = (acc_ref[...] + bo[0]).astype(dt)


def _attn_group_bwd_core(
    a2, dy, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref,
    *, heads_per_block: int, valid_len: int, dt, gg: int, sp: int,
):
    """Shared recompute-and-differentiate core for one attention head group:
    returns (dqg, dkg, dvg, ctx, dctx) as (g, Sp, gw)/(g*Sp, gw) tensors.
    Mirrors ``_attn_bwd_kernel``'s per-head math, batched over the g rows
    with single-contraction batched dot_generals (Mosaic lowers those; only
    batch+row double contractions don't — the 2-D weight products below
    collapse (g, Sp) first)."""
    gw = wq_ref.shape[1]
    dh = gw // heads_per_block
    scale = dh**-0.5

    def group_proj(w_ref, b_ref):
        return (
            _mm(a2, w_ref[...], (1,), (0,)).astype(dt) + b_ref[0].astype(dt)
        ).reshape(gg, sp, gw)

    qg = group_proj(wq_ref, bq_ref)
    kg = group_proj(wk_ref, bk_ref)
    vg = group_proj(wv_ref, bv_ref)
    dob = dy.astype(dt).reshape(gg * sp, -1)
    dctx = _mm(dob, wo_ref[...], (1,), (1,)).astype(dt).reshape(gg, sp, gw)

    bmm = lambda x, y, cx, cy: jax.lax.dot_general(
        x, y, dimension_numbers=(((cx,), (cy,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq_parts, dk_parts, dv_parts, ctx_parts = [], [], [], []
    for t in range(heads_per_block):
        sl = slice(t * dh, (t + 1) * dh)
        q, k, v = qg[:, :, sl], kg[:, :, sl], vg[:, :, sl]
        s = bmm(q, k, 2, 2) * scale                    # (g, Sp, Sp) f32
        if valid_len < sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
            s = jnp.where(col < valid_len, s, _NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)  # f32
        pb = probs.astype(dt)
        dctx_t = dctx[:, :, sl]
        ctx_parts.append(bmm(pb, v, 2, 1).astype(dt))
        dp = bmm(dctx_t, v, 2, 2)                       # (g, Sp, Sp) f32
        ds = probs * (dp - jnp.sum(probs * dp, axis=-1, keepdims=True))
        dsb = ds.astype(dt)
        dq_parts.append((bmm(dsb, k, 2, 1) * scale).astype(dt))
        dk_parts.append((bmm(dsb, q, 1, 1) * scale).astype(dt))
        dv_parts.append(bmm(pb, dctx_t, 1, 1).astype(dt))
    dqg = jnp.concatenate(dq_parts, axis=-1)
    dkg = jnp.concatenate(dk_parts, axis=-1)
    dvg = jnp.concatenate(dv_parts, axis=-1)
    ctx = jnp.concatenate(ctx_parts, axis=-1)
    return dqg, dkg, dvg, ctx, dctx


def _attn_stream_dx_kernel(
    x_ref, dy_ref, g1, b1, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    wo_ref, dx_ref, dg1_ref, db1_ref, a_ref, acc_ref,
    *, heads_per_block: int, n_groups: int, eps: float, valid_len: int,
):
    """Streaming attention backward, dx pass: da accumulates in scratch over
    the inner head-group sweep; the LN backward and its parameter cotangents
    finalize at the last group. dy here is the cotangent of the PRE-LayerScale
    output o (``attn_part_math`` contract — LayerScale/residual live outside)."""
    i = pl.program_id(0)
    hg = pl.program_id(1)
    x = x_ref[...]
    dy = dy_ref[...].astype(jnp.float32)               # (g, Sp, D) = do
    dt = x.dtype
    gg, sp, d = x.shape

    @pl.when(hg == 0)
    def _init():
        a_ref[...] = _layernorm(x, g1[0], b1[0], eps)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a2 = a_ref[...].reshape(gg * sp, d)
    dqg, dkg, dvg, _, _ = _attn_group_bwd_core(
        a2, dy, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref,
        heads_per_block=heads_per_block, valid_len=valid_len,
        dt=dt, gg=gg, sp=sp,
    )
    gw = wq_ref.shape[1]
    da = (
        _mm(dqg.reshape(gg * sp, gw), wq_ref[...], (1,), (1,))
        + _mm(dkg.reshape(gg * sp, gw), wk_ref[...], (1,), (1,))
        + _mm(dvg.reshape(gg * sp, gw), wv_ref[...], (1,), (1,))
    )
    acc_ref[...] += da.reshape(gg, sp, d)

    @pl.when((hg == n_groups - 1) & (i == 0))
    def _init_ln():
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    @pl.when(hg == n_groups - 1)
    def _fin():
        daf = acc_ref[...]
        _, xhat1, r1 = _ln_fwd_stats(x, g1[0], b1[0], eps)
        dg1_ref[...] += jnp.sum(daf * xhat1, axis=(0, 1))[None, :]
        db1_ref[...] += jnp.sum(daf, axis=(0, 1))[None, :]
        dx_ref[...] = _ln_bwd_dx(daf, xhat1, r1, g1[0]).astype(dt)


def _attn_stream_dw_kernel(
    x_ref, dy_ref, g1, b1, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    wo_ref, dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref, dbv_ref, dwo_ref,
    *, heads_per_block: int, n_groups: int, eps: float, valid_len: int,
):
    """Streaming attention backward, dw pass: head-group-MAJOR grid
    ``(n_groups, B/g)`` keeps each group's q/k/v column-gradient and
    out-projection row-gradient blocks resident in VMEM across the inner
    row sweep (same Mosaic-safe accumulation as ``_mlp_stream_dw_kernel``)."""
    i = pl.program_id(1)
    x = x_ref[...]
    dy = dy_ref[...].astype(jnp.float32)
    dt = x.dtype
    gg, sp, d = x.shape
    gw = wq_ref.shape[1]

    a2 = _layernorm(x, g1[0], b1[0], eps).reshape(gg * sp, d)
    dqg, dkg, dvg, ctx, _ = _attn_group_bwd_core(
        a2, dy, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref,
        heads_per_block=heads_per_block, valid_len=valid_len,
        dt=dt, gg=gg, sp=sp,
    )

    @pl.when(i == 0)
    def _init():
        for ref in (dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref, dbv_ref,
                    dwo_ref):
            ref[...] = jnp.zeros_like(ref)

    dob = dy.astype(dt).reshape(gg * sp, d)
    dq2 = dqg.reshape(gg * sp, gw)
    dk2 = dkg.reshape(gg * sp, gw)
    dv2 = dvg.reshape(gg * sp, gw)
    dwq_ref[...] += _mm(a2, dq2, (0,), (0,))           # (D, gw) f32
    dwk_ref[...] += _mm(a2, dk2, (0,), (0,))
    dwv_ref[...] += _mm(a2, dv2, (0,), (0,))
    dbq_ref[...] += jnp.sum(dq2.astype(jnp.float32), axis=0)[None, :]
    dbk_ref[...] += jnp.sum(dk2.astype(jnp.float32), axis=0)[None, :]
    dbv_ref[...] += jnp.sum(dv2.astype(jnp.float32), axis=0)[None, :]
    dwo_ref[...] += _mm(ctx.reshape(gg * sp, gw), dob, (0,), (0,))  # (gw, D)


def _mlp_stream_call(kernel, extra_in, x2p, mp_names, mp, eps, g, bh, out_dtype):
    """Shared pallas_call builder for the streaming MLP forward/dx kernels."""
    b, sp, d = x2p.shape
    _, vecs, _ = _prep_block_args(x2p, mp, mp_names)
    named = dict(zip(mp_names, vecs))
    wdt = x2p.dtype
    w1 = mp.w1.astype(wdt)
    w2 = mp.w2.astype(wdt)
    n_blocks = mp.w1.shape[-1] // bh  # actual hidden width, not 4*d

    xspec = pl.BlockSpec((g, sp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    vspec = lambda a: pl.BlockSpec(
        a.shape, lambda i, j: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    w1spec = pl.BlockSpec((d, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    bf1spec = pl.BlockSpec((1, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((bh, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM)

    in_specs = [xspec] + [xspec] * len(extra_in)
    in_specs += [vspec(named["g2"]), vspec(named["b2"]), w1spec, bf1spec, w2spec]
    operands = [x2p, *extra_in, named["g2"], named["b2"], w1, named["bf1"], w2]
    if "bf2" in named:
        in_specs.append(vspec(named["bf2"]))
        operands.append(named["bf2"])
    in_specs.append(vspec(named["ls2"]))
    operands.append(named["ls2"])

    return pl.pallas_call(
        functools.partial(kernel, eps=eps, n_blocks=n_blocks),
        grid=(b // g, n_blocks),
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((g, sp, d), x2p.dtype),
            pltpu.VMEM((g, sp, d), jnp.float32),
        ],
        interpret=_dispatch_target()[0] != "tpu",
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_mlp_part_stream(
    x2: Array, mp: MlpParams, eps: float, assume_frozen_weights: bool = False
) -> Array:
    """Weight-streaming fused MLP half (D too large for resident weights).

    ``assume_frozen_weights=True`` backward runs the streaming
    activation-only dx kernel (zero weight cotangents — LoRA frozen-backbone
    contract); otherwise the backward falls back to jax.vjp of the unfused
    math (exact, slower — trainable big-D blocks are not a production
    config)."""
    b, s, d = x2.shape
    sp = -(-s // 8) * 8
    x2p = jnp.pad(x2, [(0, 0), (0, sp - s), (0, 0)]) if sp != s else x2
    plan = _stream_mlp_plan(sp, d, x2.dtype.itemsize, b, hidden=mp.w1.shape[-1])
    if plan is None:
        raise ValueError(
            f"no streaming MLP plan fits VMEM for (S={s}, D={d}); gate with "
            "stream_fused_enabled before dispatching"
        )
    g, bh = plan
    names = ["g2", "b2", "w1", "bf1", "w2", "bf2", "ls2"]
    out = _mlp_stream_call(
        _mlp_stream_kernel, [], x2p, names, mp, eps, g, bh, x2p.dtype
    )
    return out[:, :s, :] if sp != s else out


def _mlp_stream_train_call(x2p, mp, eps, g, bh):
    """(y, h2) from the train-forward streaming kernel (h2 = pre-LayerScale
    MLP output, saved as a backward residual)."""
    b, sp, d = x2p.shape
    names = ["g2", "b2", "w1", "bf1", "w2", "bf2", "ls2"]
    _, vecs, _ = _prep_block_args(x2p, mp, names)
    named = dict(zip(names, vecs))
    wdt = x2p.dtype
    n_blocks = mp.w1.shape[-1] // bh

    xspec = pl.BlockSpec((g, sp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    vspec = lambda a: pl.BlockSpec(
        a.shape, lambda i, j: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    w1spec = pl.BlockSpec((d, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    bf1spec = pl.BlockSpec((1, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((bh, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_mlp_stream_train_kernel, eps=eps, n_blocks=n_blocks),
        grid=(b // g, n_blocks),
        in_specs=[xspec, vspec(named["g2"]), vspec(named["b2"]), w1spec,
                  bf1spec, w2spec, vspec(named["bf2"]), vspec(named["ls2"])],
        out_specs=[xspec, xspec],
        out_shape=[jax.ShapeDtypeStruct((b, sp, d), x2p.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((g, sp, d), x2p.dtype),
            pltpu.VMEM((g, sp, d), jnp.float32),
        ],
        interpret=_dispatch_target()[0] != "tpu",
    )(x2p, named["g2"], named["b2"], mp.w1.astype(wdt), named["bf1"],
      mp.w2.astype(wdt), named["bf2"], named["ls2"])


def _mlp_stream_dx_full_call(x2p, dyp, mp, eps, g, bh):
    """(dx2, dg2, db2) from the extended streaming dx kernel."""
    b, sp, d = x2p.shape
    names = ["g2", "b2", "w1", "bf1", "w2", "ls2"]
    _, vecs, _ = _prep_block_args(x2p, mp, names)
    named = dict(zip(names, vecs))
    wdt = x2p.dtype
    n_blocks = mp.w1.shape[-1] // bh

    xspec = pl.BlockSpec((g, sp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    vspec = lambda a: pl.BlockSpec(
        a.shape, lambda i, j: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    w1spec = pl.BlockSpec((d, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    bf1spec = pl.BlockSpec((1, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((bh, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    lnspec = pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_mlp_stream_dx_full_kernel, eps=eps, n_blocks=n_blocks),
        grid=(b // g, n_blocks),
        in_specs=[xspec, xspec, vspec(named["g2"]), vspec(named["b2"]),
                  w1spec, bf1spec, w2spec, vspec(named["ls2"])],
        out_specs=[xspec, lnspec, lnspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, sp, d), x2p.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, sp, d), x2p.dtype),
            pltpu.VMEM((g, sp, d), jnp.float32),
        ],
        interpret=_dispatch_target()[0] != "tpu",
    )(x2p, dyp, named["g2"], named["b2"], mp.w1.astype(wdt), named["bf1"],
      mp.w2.astype(wdt), named["ls2"])


def _mlp_stream_dw_call(x2p, dyp, mp, eps, g, bh):
    """(dw1, dbf1, dw2) from the hidden-block-major streaming dw kernel."""
    b, sp, d = x2p.shape
    names = ["g2", "b2", "w1", "bf1", "w2", "ls2"]
    _, vecs, _ = _prep_block_args(x2p, mp, names)
    named = dict(zip(names, vecs))
    wdt = x2p.dtype
    hidden = mp.w1.shape[-1]
    n_blocks = hidden // bh

    # Hidden-block-MAJOR grid: j = program_id(0), rows inner.
    xspec = pl.BlockSpec((g, sp, d), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM)
    vspec = lambda a: pl.BlockSpec(
        a.shape, lambda j, i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    w1spec = pl.BlockSpec((d, bh), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    bf1spec = pl.BlockSpec((1, bh), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((bh, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_mlp_stream_dw_kernel, eps=eps, n_blocks=n_blocks),
        grid=(n_blocks, b // g),
        in_specs=[xspec, xspec, vspec(named["g2"]), vspec(named["b2"]),
                  w1spec, bf1spec, w2spec, vspec(named["ls2"])],
        out_specs=[w1spec, bf1spec, w2spec],
        out_shape=[
            jax.ShapeDtypeStruct((d, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, d), jnp.float32),
        ],
        interpret=_dispatch_target()[0] != "tpu",
    )(x2p, dyp, named["g2"], named["b2"], mp.w1.astype(wdt), named["bf1"],
      mp.w2.astype(wdt), named["ls2"])


def _mlp_stream_fwd(x2, mp, eps, assume_frozen_weights=False):
    if assume_frozen_weights:
        return fused_mlp_part_stream(x2, mp, eps, assume_frozen_weights), (
            x2, mp, None
        )
    # Trainable weights: run the train-forward variant that also saves the
    # pre-LayerScale output h2 (the LayerScale cotangent residual).
    b, s, d = x2.shape
    sp = -(-s // 8) * 8
    x2p = jnp.pad(x2, [(0, 0), (0, sp - s), (0, 0)]) if sp != s else x2
    # The dx=True plan over-reserves vs the train forward's true working set
    # (extra dy stream vs the h2 output stream) — reused as a safe bound.
    plan = _stream_mlp_plan(
        sp, d, x2.dtype.itemsize, b, dx=True, hidden=mp.w1.shape[-1]
    )
    if plan is None:
        return fused_mlp_part_stream(x2, mp, eps, assume_frozen_weights), (
            x2, mp, None
        )
    g, bh = plan
    y, h2 = _mlp_stream_train_call(x2p, mp, eps, g, bh)
    if sp != s:
        y, h2 = y[:, :s, :], h2[:, :s, :]
    return y, (x2, mp, h2)


def _mlp_stream_bwd(eps, assume_frozen_weights, residuals, dy):
    x2, mp, h2 = residuals
    b, s, d = x2.shape
    sp = -(-s // 8) * 8
    pad = [(0, 0), (0, sp - s), (0, 0)]
    hidden = mp.w1.shape[-1]
    if not assume_frozen_weights:
        plan_dx = _stream_mlp_plan(
            sp, d, x2.dtype.itemsize, b, dx=True, hidden=hidden
        )
        plan_dw = _stream_mlp_dw_plan(sp, d, x2.dtype.itemsize, b, hidden)
        if h2 is None or plan_dx is None or plan_dw is None:
            # No streaming plan fits: exact unfused fallback.
            _, vjp = jax.vjp(
                lambda x_, mp_: mlp_part_math(x_, mp_, eps=eps), x2, mp
            )
            return vjp(dy)
        x2p = jnp.pad(x2, pad) if sp != s else x2
        dyp = jnp.pad(dy, pad) if sp != s else dy
        dx2p, dg2, db2 = _mlp_stream_dx_full_call(
            x2p, dyp, mp, eps, plan_dx[0], plan_dx[1]
        )
        dw1, dbf1, dw2 = _mlp_stream_dw_call(
            x2p, dyp, mp, eps, plan_dw[0], plan_dw[1]
        )
        dx2 = dx2p[:, :s, :] if sp != s else dx2p
        # LayerScale / fc2-bias cotangents from the saved h2 (padding-free
        # tensors; matches the non-streaming kernel's bf16-h2 precision).
        dyf = dy.astype(jnp.float32)
        dls2 = jnp.einsum("bsd,bsd->d", dyf, h2.astype(jnp.float32))
        dbf2 = mp.ls2.astype(jnp.float32).reshape(-1) * jnp.sum(dyf, axis=(0, 1))
        cast = lambda v, ref: v.reshape(ref.shape).astype(ref.dtype)
        dmp = MlpParams(
            g2=cast(dg2, mp.g2),
            b2=cast(db2, mp.b2),
            w1=cast(dw1, mp.w1),
            bf1=cast(dbf1, mp.bf1),
            w2=cast(dw2, mp.w2),
            bf2=cast(dbf2, mp.bf2),
            ls2=cast(dls2, mp.ls2),
        )
        return dx2, dmp
    x2p = jnp.pad(x2, pad) if sp != s else x2
    dyp = jnp.pad(dy, pad) if sp != s else dy
    plan = _stream_mlp_plan(sp, d, x2.dtype.itemsize, b, dx=True, hidden=hidden)
    if plan is None:  # no streaming dx plan: exact unfused fallback
        _, vjp = jax.vjp(lambda x_, mp_: mlp_part_math(x_, mp_, eps=eps), x2, mp)
        return vjp(dy)
    g, bh = plan
    names = ["g2", "b2", "w1", "bf1", "w2", "ls2"]
    dx2p = _mlp_stream_call(
        _mlp_stream_dx_kernel, [dyp], x2p, names, mp, eps, g, bh, x2p.dtype
    )
    dx2 = dx2p[:, :s, :] if sp != s else dx2p
    return dx2, jax.tree.map(jnp.zeros_like, mp)


fused_mlp_part_stream.defvjp(_mlp_stream_fwd, _mlp_stream_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_attn_part_stream(
    x: Array, ap: AttnParams, num_heads: int, eps: float
) -> Array:
    """Head-streaming fused attention half: q/k/v column slices and
    output-projection row slices stream per head while LN1(x) and the f32
    output accumulator stay resident. The backward runs the streaming
    dx + dw kernel pair (full weight cotangents) when a plan fits, else the
    exact unfused vjp."""
    b, s, d = x.shape
    dh = d // num_heads
    sp = -(-s // 8) * 8
    xp = jnp.pad(x, [(0, 0), (0, sp - s), (0, 0)]) if sp != s else x
    plan = _stream_attn_plan(sp, d, dh, x.dtype.itemsize, b, num_heads)
    if plan is None:
        raise ValueError(
            f"no streaming attention plan fits VMEM for (S={s}, D={d}); "
            "gate with stream_fused_enabled before dispatching"
        )
    g, hpb = plan
    n_groups = num_heads // hpb
    gw = hpb * dh

    wdt = x.dtype
    wq, wk, wv = jnp.split(ap.wqkv.astype(wdt), 3, axis=1)
    bq, bk, bv = jnp.split(ap.bqkv.reshape(1, -1).astype(jnp.float32), 3, axis=1)
    wo = ap.wo.astype(wdt)
    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    g1, b1, bo = vec(ap.g1), vec(ap.b1), vec(ap.bo)

    xspec = pl.BlockSpec((g, sp, d), lambda i, h: (i, 0, 0), memory_space=pltpu.VMEM)
    vspec = lambda a: pl.BlockSpec(
        a.shape, lambda i, h: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    colspec = pl.BlockSpec((d, gw), lambda i, h: (0, h), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, gw), lambda i, h: (0, h), memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((gw, d), lambda i, h: (h, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _attn_stream_kernel, heads_per_block=hpb, n_groups=n_groups,
            eps=eps, valid_len=s,
        ),
        grid=(b // g, n_groups),
        in_specs=[xspec, vspec(g1), vspec(b1), colspec, colspec, colspec,
                  bspec, bspec, bspec, rowspec, vspec(bo)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, sp, d), x.dtype),
            pltpu.VMEM((g, sp, d), jnp.float32),
        ],
        interpret=_dispatch_target()[0] != "tpu",
    )(xp, g1, b1, wq, wk, wv, bq, bk, bv, wo, bo)
    return out[:, :s, :] if sp != s else out


def _attn_stream_fwd(x, ap, num_heads, eps):
    return fused_attn_part_stream(x, ap, num_heads, eps), (x, ap)


def _attn_stream_bwd_call(kernel, xp, dyp, ap, num_heads, eps, g, hpb,
                          out_specs, out_shape, scratch_shapes, valid_len):
    """Shared pallas_call builder for the streaming attention backward
    passes. ``kernel`` decides the grid orientation via its out_specs: the
    dx pass runs rows-major ``(B/g, n_groups)``, the dw pass group-major
    ``(n_groups, B/g)`` — encoded by the caller's index maps."""
    b, sp, d = xp.shape
    dh = d // num_heads
    n_groups = num_heads // hpb
    gw = hpb * dh
    wdt = xp.dtype

    wq, wk, wv = jnp.split(ap.wqkv.astype(wdt), 3, axis=1)
    bq, bk, bv = jnp.split(ap.bqkv.reshape(1, -1).astype(jnp.float32), 3, axis=1)
    wo = ap.wo.astype(wdt)
    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    g1, b1 = vec(ap.g1), vec(ap.b1)
    dx_pass = kernel is _attn_stream_dx_kernel
    if dx_pass:
        grid = (b // g, n_groups)
        xmap = lambda i, h: (i, 0, 0)
        hmap_col = lambda i, h: (0, h)
        hmap_row = lambda i, h: (h, 0)
    else:
        grid = (n_groups, b // g)
        xmap = lambda h, i: (i, 0, 0)
        hmap_col = lambda h, i: (0, h)
        hmap_row = lambda h, i: (h, 0)
    xspec = pl.BlockSpec((g, sp, d), xmap, memory_space=pltpu.VMEM)
    vspec = lambda a: pl.BlockSpec(
        a.shape, lambda *_: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    colspec = pl.BlockSpec((d, gw), hmap_col, memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, gw), hmap_col, memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((gw, d), hmap_row, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            kernel, heads_per_block=hpb, n_groups=n_groups, eps=eps,
            valid_len=valid_len,
        ),
        grid=grid,
        in_specs=[xspec, xspec, vspec(g1), vspec(b1), colspec, colspec,
                  colspec, bspec, bspec, bspec, rowspec],
        out_specs=out_specs(xspec, colspec, bspec, rowspec),
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=_dispatch_target()[0] != "tpu",
    )(xp, dyp, g1, b1, wq, wk, wv, bq, bk, bv, wo)


def _attn_stream_bwd(num_heads, eps, residuals, dy):
    """Full streaming attention backward: dx pass (da accumulator + LN
    cotangents) and head-group-major dw pass; falls back to the exact
    unfused vjp when no streaming plan fits (e.g. S=1370 at D=1024)."""
    x, ap = residuals
    b, s, d = x.shape
    dh = d // num_heads
    sp = -(-s // 8) * 8
    plan_dx = _stream_attn_bwd_plan(
        sp, d, dh, x.dtype.itemsize, b, num_heads, dw=False
    )
    plan_dw = _stream_attn_bwd_plan(
        sp, d, dh, x.dtype.itemsize, b, num_heads, dw=True
    )
    if plan_dx is None or plan_dw is None:
        _, vjp = jax.vjp(
            lambda x_, ap_: attn_part_math(x_, ap_, num_heads=num_heads, eps=eps),
            x, ap,
        )
        return vjp(dy)
    pad = [(0, 0), (0, sp - s), (0, 0)]
    xp = jnp.pad(x, pad) if sp != s else x
    dyp = jnp.pad(dy, pad) if sp != s else dy
    f32 = jnp.float32

    g, hpb = plan_dx
    dxp, dg1, db1 = _attn_stream_bwd_call(
        _attn_stream_dx_kernel, xp, dyp, ap, num_heads, eps, g, hpb,
        out_specs=lambda xspec, colspec, bspec, rowspec: [
            xspec,
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sp, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, sp, d), x.dtype),
            pltpu.VMEM((g, sp, d), f32),
        ],
        valid_len=s,
    )

    g, hpb = plan_dw
    gw = hpb * dh
    dwq, dwk, dwv, dbq, dbk, dbv, dwo = _attn_stream_bwd_call(
        _attn_stream_dw_kernel, xp, dyp, ap, num_heads, eps, g, hpb,
        out_specs=lambda xspec, colspec, bspec, rowspec: [
            colspec, colspec, colspec, bspec, bspec, bspec, rowspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
        ],
        scratch_shapes=[],
        valid_len=s,
    )

    dx = dxp[:, :s, :] if sp != s else dxp
    dbo = jnp.sum(dy.astype(f32), axis=(0, 1))
    cast = lambda v, ref: v.reshape(ref.shape).astype(ref.dtype)
    dap = AttnParams(
        g1=cast(dg1, ap.g1),
        b1=cast(db1, ap.b1),
        wqkv=cast(jnp.concatenate([dwq, dwk, dwv], axis=1), ap.wqkv),
        bqkv=cast(jnp.concatenate([dbq, dbk, dbv], axis=1), ap.bqkv),
        wo=cast(dwo, ap.wo),
        bo=cast(dbo, ap.bo),
    )
    return dx, dap


fused_attn_part_stream.defvjp(_attn_stream_fwd, _attn_stream_bwd)


def dispatch_attn_part_stream(x, ap: AttnParams, num_heads: int, eps: float) -> Array:
    platform, n_devices = _dispatch_target()
    if n_devices == 1:
        return fused_attn_part_stream(x, ap, num_heads, eps)
    mesh = _dp_shard_mesh(x.shape[0])
    if mesh is not None:
        return _shard_map_dp(
            lambda x_, ap_: fused_attn_part_stream(x_, ap_, num_heads, eps),
            mesh, x, ap,
        )
    return attn_part_math(x, ap, num_heads=num_heads, eps=eps)


def dispatch_mlp_part_stream(
    x2, mp: MlpParams, eps: float, assume_frozen_weights: bool = False
) -> Array:
    platform, n_devices = _dispatch_target()
    if n_devices == 1:
        return fused_mlp_part_stream(x2, mp, eps, assume_frozen_weights)
    mesh = _dp_shard_mesh(x2.shape[0])
    if mesh is not None:
        return _shard_map_dp(
            lambda x2_, mp_: fused_mlp_part_stream(
                x2_, mp_, eps, assume_frozen_weights
            ),
            mesh, x2, mp,
        )
    return mlp_part_math(x2, mp, eps=eps)


def stream_fused_enabled(
    hidden_size: int, seq_len: int = 257, itemsize: int = 2, num_heads: int = 16,
    mlp_hidden: int | None = None, for_training: bool = False,
) -> bool:
    """Dispatch for the weight-STREAMING split kernels: engaged only when
    the whole-half kernels do not fit (``parts_fused_enabled`` is False —
    resident weights beat streamed weights when possible) but a streaming
    plan exists for both halves. ``for_training=True`` drops the
    resident-half preference: the resident halves have no VMEM-fitting
    WEIGHT-cotangent backward above the monolithic regime (the (D, 4D) f32
    accumulators alone exceed the scoped budget at D=768), so a trainable
    big-D block wants the streaming pair even where the resident forward
    would win. ``DINO_POSE_TPU_BLOCK=unfused|xla`` disables, ``=stream``
    forces (test hook; interpret mode off-TPU)."""
    import os

    override = os.environ.get("DINO_POSE_TPU_BLOCK", "").lower()
    if override in ("unfused", "xla"):
        return False
    if override != "stream":
        platform, n_devices = _dispatch_target()
        if platform != "tpu":
            return False
        if n_devices > 1 and not _pure_dp_mesh(n_devices):
            return False
        if not for_training and parts_fused_enabled(
            hidden_size, seq_len, itemsize, mlp_hidden=mlp_hidden
        ):
            return False  # whole-half kernels are strictly better when they fit
    d = hidden_size
    sp = -(-seq_len // 8) * 8
    return (
        _stream_mlp_plan(sp, d, itemsize, 1, hidden=mlp_hidden) is not None
        and _stream_attn_plan(sp, d, d // num_heads, itemsize, 1, num_heads)
        is not None
    )


def parts_fused_enabled(
    hidden_size: int, seq_len: int = 257, itemsize: int = 2,
    num_heads: int | None = None, mlp_hidden: int | None = None,
) -> bool:
    """Dispatch for SPLIT-kernel fusion of big backbones (dinov2-base/
    large): the monolithic block kernel needs all 12 D^2 weights in VMEM,
    but each half fits on its own up to D ~= 768. The halves pay one extra
    activation round-trip (the LayerScale+residual between them runs in
    XLA), so the monolithic kernel stays preferred when it fits.

    On a tensor-parallel ('model' axis tp > 1) mesh the halves run
    per-shard on Megatron weight slices with a psum stitch
    (:func:`attn_part_tp` / :func:`mlp_part_tp`) — the weight working set
    divides by tp, so e.g. dinov2-large's halves (too big resident on one
    chip, hence the streaming kernels) fit RESIDENT per shard at tp >= 2.
    Requires ``num_heads`` (for the head split) — callers that cannot
    provide it stay on the single-device/pure-DP criterion.

    ``DINO_POSE_TPU_BLOCK=unfused|xla`` disables, ``=parts`` forces (test
    hook; interpret mode off-TPU)."""
    import os

    override = os.environ.get("DINO_POSE_TPU_BLOCK", "").lower()
    if override in ("unfused", "xla"):
        return False
    tp = 1
    if override != "parts":
        platform, n_devices = _dispatch_target()
        if platform != "tpu":
            return False
        if n_devices > 1 and not _pure_dp_mesh(n_devices):
            tp = _tp_axis_size(n_devices)
            if tp is None or num_heads is None or num_heads % tp:
                return False
            if mlp_hidden is not None and mlp_hidden % tp:
                # The fit verdict below divides the MLP working set by tp;
                # a width the Megatron split cannot divide would dispatch
                # to unfused math anyway (_tp_shard_mesh rejects it).
                return False
    d = hidden_size
    sp = -(-seq_len // 8) * 8
    i = itemsize  # f32 tracing (e.g. model init) doubles the working set
    # FORWARD working sets only — this dispatch serves frozen/inference
    # layers whose backward is never built. Attention half: qkv+out weights
    # (8 D^2, / tp per shard), one row's activation chain, per-head f32
    # score tile. MLP half: fc1+fc2 weights 2·D·h (/ tp), one live
    # (Sp, h/tp) hidden tensor, h = actual fc1 width.
    h = 4 * d if mlp_hidden is None else mlp_hidden  # actual fc1 width
    attn = 8 * d * d * i // tp + 7 * sp * d * i + 2 * sp * sp * 4
    mlp = 2 * d * h * i // tp + 3 * sp * d * i + sp * h * i // tp
    return max(attn, mlp) <= 13 * 1024 * 1024


def _tp_axis_size(n_devices: int) -> int | None:
    """'model' axis size of the trace-target mesh, or None if no mesh of
    ``n_devices`` is configured."""
    from dino_pose_tpu.ops.dispatch import target_mesh

    mesh = target_mesh()
    if mesh is None or mesh.devices.size != n_devices:
        return None
    return mesh.shape.get("model", 1)


def fused_block_sharded(
    x: Array, p: BlockParams, num_heads: int, eps: float, mesh
) -> Array:
    """Fused block under a multi-device mesh via ``shard_map``.

    ``pallas_call`` is not auto-partitioned by pjit, so the kernel is mapped
    manually: batch sharded over the mesh 'data' axis, parameters replicated
    (P()), one fused program per shard. Requires the 'model' axis to be
    trivial — Megatron-sharded weights would need per-layer all-gathers
    here, which defeats the kernel (those configs use the unfused path).
    Inside the trainer's pjit step the batch already carries a
    ``P('data')`` sharding, so no resharding is inserted.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        lambda x_, p_: fused_block(x_, p_, num_heads, eps),
        mesh=mesh,
        in_specs=(P("data"), P()),
        out_specs=P("data"),
        check_rep=False,  # custom_vjp inside; skip the replication checker
    )(x, p)


def dispatch_block(x: Array, p: BlockParams, num_heads: int, eps: float) -> Array:
    """Route to the plain or shard_map-wrapped fused kernel by mesh size."""
    from dino_pose_tpu.ops.dispatch import target_mesh

    platform, n_devices = _dispatch_target()
    mesh = target_mesh()
    if (
        n_devices > 1
        and mesh is not None
        and mesh.devices.size == n_devices
        and x.shape[0] % mesh.shape.get("data", 1) == 0
    ):
        return fused_block_sharded(x, p, num_heads, eps, mesh)
    return fused_block(x, p, num_heads, eps)


def fused_blocks_enabled(
    hidden_size: int, seq_len: int = 257, itemsize: int = 2,
    mlp_hidden: int | None = None,
) -> bool:
    """Static dispatch: fused blocks on a TPU backend, small-enough shapes.

    The working set (weights + one batch row's activations and scores) must
    fit VMEM: true for hidden_size <= ~512 at production sequence lengths,
    false for long sequences (e.g. dinov2 at 518 input runs S=1370, whose
    f32 score tile alone is 7.6 MB) — those fall back to the unfused path,
    whose attention dispatch picks the flash kernel instead.

    ``DINO_POSE_TPU_BLOCK=fused|unfused`` overrides (benchmark hook).
    Multi-device: fused via shard_map on pure-DP meshes — frozen/inference
    blocks through :func:`dispatch_block`, trainable/LoRA blocks through
    :func:`dispatch_block_train` / the split-part dispatches with explicit
    parameter-cotangent psums. Megatron ('model'-axis) meshes shard the
    weights the kernel needs whole, so they stay on the unfused path.
    """
    import os

    if mlp_hidden is not None and mlp_hidden != 4 * hidden_size:
        # The monolithic kernel family (incl. _grad_shapes and its VMEM
        # models) is built for the DINOv2 ratio-4 MLP; other ratios route
        # to the split/streaming dispatches, which read actual shapes.
        # Checked BEFORE the env override: =fused must not force a kernel
        # whose gradient accumulators cannot represent the weights.
        return False
    override = os.environ.get("DINO_POSE_TPU_BLOCK", "").lower()
    if override in ("fused", "pallas"):
        return True
    if override in ("unfused", "xla"):
        return False
    platform, n_devices = _dispatch_target()
    if platform != "tpu" or hidden_size > 512:
        return False
    sp = -(-seq_len // 8) * 8
    if _rows_per_program(sp, hidden_size, itemsize) < 1:
        return False
    return n_devices == 1 or _pure_dp_mesh(n_devices)


def _pure_dp_mesh(n_devices: int) -> bool:
    """True when the trace target is a mesh whose non-'data' axes are trivial."""
    from dino_pose_tpu.ops.dispatch import target_mesh

    mesh = target_mesh()
    return (
        mesh is not None
        and mesh.devices.size == n_devices
        and mesh.shape.get("model", 1) == 1
    )
