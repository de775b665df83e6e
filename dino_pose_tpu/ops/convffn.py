"""Fused ConvFFN MLP kernel for the FastViT family.

The ConvFFN (reference: timm's FastViT ConvFFN consumed via
/root/reference/model/fastvit_pose.py:21, with the reference's ConvLoRA
adapters from /root/reference/model/lora.py:68-149 on fc1/fc2) is, after the
round-4 branch-output-reuse restructure, the dominant remaining cost of the
FastViT train step: its 1x1 fc1 expands the stage activation 3-4x into a
hidden tensor that XLA materialises in HBM (a stage-0 hidden at bs=128 is
~150 MB bf16), reads back for GELU+fc2, and touches again for each LoRA
adapter — the round-4 device trace (PERFORMANCE.md "step profile") showed
the step is ~600 ops of exactly such full-activation passes.

This kernel runs the whole post-depthwise-conv chain

    m   = y * inv + shift                    # BatchNorm as a per-channel affine
    h   = m @ W1 + b1 + ((m @ A1) * mask1) @ B1 * s     # fc1 + ConvLoRA
    g   = gelu(h)
    out = g @ W2 + b2 + ((g @ A2) * mask2) @ B2 * s     # fc2 + ConvLoRA

in one VMEM pass per batch-row block: the hidden tensor (h, g) never exists
in HBM, in forward OR backward. The 1x1 convs are row-major matmuls over the
flattened (H*W) axis, so the MXU sees the same GEMMs XLA would run — the win
is purely HBM passes (read y + write out, vs ~10 C-sized + 2 3C-sized passes
for the unfused chain).

Batch statistics stay OUTSIDE the kernel (one XLA reduction over y, shared
with the running-stat update); the kernel takes the resulting (inv, shift)
affine as differentiable inputs, so autodiff composes the exact BatchNorm
train backward through the statistics without the kernel knowing about them
— the same reasoning that made branch math beat the train-time fold
(models/fastvit_fold.py docstring), applied at kernel granularity.

Backward contract mirrors ``fused_mlp_part(assume_frozen_weights=True)``
(ops/block.py): the base fc1/fc2 weights get ZERO cotangents — valid only
under the reference's LoRA semantics where the whole backbone is frozen
(lora.py:151-166); the trainable LoRA adapters (A1/B1/A2/B2) and the BN
affine (inv, shift — which carries the batch-statistics path into dy) get
exact gradients, accumulated in VMEM across the sequential batch grid.
Dispatch (:func:`convffn_fused_enabled`) therefore requires ``lora_rank > 0``
for training; eval mode (no grads) is always eligible.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dino_pose_tpu.ops.block import _CONST, _gelu_exact, _gelu_grad, _mm
from dino_pose_tpu.ops.dispatch import target as _dispatch_target

Array = jax.Array


class ConvFFNParams(NamedTuple):
    """Everything the fused kernel needs past the depthwise conv.

    ``inv``/``shift`` are the BatchNorm-as-affine pair from
    ``fastvit_fold.BNAffine`` (f32); weights are squeezed 1x1-conv kernels;
    ``m1``/``m2`` are the per-(sample, rank-channel) Dropout2d masks already
    scaled by 1/keep (ones when deterministic). Zero-size LoRA is expressed
    as rank-1 zero adapters with ones masks — their gradients vanish
    algebraically, keeping one kernel for every configuration."""

    inv: Array    # (C,)  f32
    shift: Array  # (C,)  f32
    w1: Array     # (C, H)
    b1: Array     # (H,)
    w2: Array     # (H, C)
    b2: Array     # (C,)
    a1: Array     # (C, R)
    b1l: Array    # (R, H)
    a2: Array     # (H, R)
    b2l: Array    # (R, C)
    m1: Array     # (B, R) f32
    m2: Array     # (B, R) f32


def _mm3(a: Array, b: Array) -> Array:
    """(G, Sp, X) @ (X, Y) -> (G, Sp, Y) f32 accumulate."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _convffn_fwd_kernel(
    y_ref, m1_ref, m2_ref, inv, shift, w1, b1, w2, b2, a1, b1l, a2, b2l,
    out_ref, *, s_lora: float, res_ref=None,
):
    y = y_ref[...]                                   # (G, Sp, C)
    dt = y.dtype
    m = (y.astype(jnp.float32) * inv[0] + shift[0]).astype(dt)
    u1 = _mm3(m, a1[...]) * m1_ref[...]              # masks (G, 1, R) broadcast
    h = (
        _mm3(m, w1[...]).astype(dt)
        + b1[0].astype(dt)
        + (_mm3(u1.astype(dt), b1l[...]) * s_lora).astype(dt)
    )
    g = _gelu_exact(h)
    u2 = _mm3(g, a2[...]) * m2_ref[...]
    out = (
        _mm3(g, w2[...]).astype(dt)
        + b2[0].astype(dt)
        + (_mm3(u2.astype(dt), b2l[...]) * s_lora).astype(dt)
    )
    if res_ref is not None:
        out = out + res_ref[...]
    out_ref[...] = out


def _convffn_bwd_kernel(
    y_ref, df_ref, m1_ref, m2_ref, inv, shift, w1, b1, w2, b2, a1, b1l, a2, b2l,
    dy_ref, dinv_ref, dshift_ref, da1_ref, db1l_ref, da2_ref, db2l_ref,
    *, s_lora: float,
):
    """dy + exact (dinv, dshift, dA1, dB1, dA2, dB2); base weights frozen.

    One (sample, row-chunk) per program — the grid is sequential on a TPU
    core, so the parameter cotangents accumulate in VMEM across programs
    (same pattern as ops/block.py ``_mlp_bwd_kernel``)."""
    i = pl.program_id(0)
    y = y_ref[0]                                     # (Spt, C)
    df = df_ref[0].astype(jnp.float32)
    m1 = m1_ref[0]                                   # (1, R) f32
    m2 = m2_ref[0]
    dt = y.dtype
    yf = y.astype(jnp.float32)

    # Recompute the forward chain (same dtype staging as the fwd kernel).
    m = (yf * inv[0] + shift[0]).astype(dt)
    u1 = _mm(m, a1[...], (1,), (0,)) * m1            # (Spt, R) f32
    u1b = u1.astype(dt)
    h = (
        _mm(m, w1[...], (1,), (0,)).astype(dt)
        + b1[0].astype(dt)
        + (_mm(u1b, b1l[...], (1,), (0,)) * s_lora).astype(dt)
    )
    g = _gelu_exact(h)

    dfb = df.astype(dt)
    u2 = _mm(g, a2[...], (1,), (0,)) * m2
    u2b = u2.astype(dt)
    db2l_p = _mm(u2b, dfb, (0,), (0,)) * s_lora      # (R, C) f32
    du2 = _mm(dfb, b2l[...], (1,), (1,)) * s_lora * m2
    du2b = du2.astype(dt)
    da2_p = _mm(g, du2b, (0,), (0,))                 # (H, R) f32
    dg = _mm(dfb, w2[...], (1,), (1,)) + _mm(du2b, a2[...], (1,), (1,))
    dh = dg * _gelu_grad(h.astype(jnp.float32))      # (Spt, H) f32
    dhb = dh.astype(dt)
    db1l_p = _mm(u1b, dhb, (0,), (0,)) * s_lora      # (R, H) f32
    du1 = _mm(dhb, b1l[...], (1,), (1,)) * s_lora * m1
    du1b = du1.astype(dt)
    da1_p = _mm(m, du1b, (0,), (0,))                 # (C, R) f32
    dm = _mm(dhb, w1[...], (1,), (1,)) + _mm(du1b, a1[...], (1,), (1,))
    dinv_p = jnp.sum(dm * yf, axis=0)[None, :]
    dshift_p = jnp.sum(dm, axis=0)[None, :]
    dy_ref[0] = (dm * inv[0]).astype(dt)

    @pl.when(i == 0)
    def _init():
        for ref in (dinv_ref, dshift_ref, da1_ref, db1l_ref, da2_ref, db2l_ref):
            ref[...] = jnp.zeros_like(ref)

    dinv_ref[...] += dinv_p
    dshift_ref[...] += dshift_p
    da1_ref[...] += da1_p
    db1l_ref[...] += db1l_p
    da2_ref[...] += da2_p
    db2l_ref[...] += db2l_p


_FWD_BUDGET = 12 * 1024 * 1024
_BWD_BUDGET = 10 * 1024 * 1024


def _fwd_bytes(
    g: int, sp: int, c: int, h: int, r: int, i: int, streams: int = 2
) -> int:
    """Conservative VMEM model of the forward working set at g rows."""
    stream_b = streams * (2 * g * sp * c * i)       # y (+res) in + out, 2x-buffered
    temps = g * sp * c * (i + 4) + g * sp * h * (2 * i + 8) + g * sp * r * 12
    weights = 2 * c * h * i + 2 * r * (c + h) * i
    return stream_b + temps + weights


def _bwd_bytes(spt: int, c: int, h: int, r: int, i: int) -> int:
    streams = 3 * (2 * spt * c * i)                 # y, df, dy
    temps = spt * c * (2 * i + 12) + spt * h * (3 * i + 12) + spt * r * 16
    weights = 2 * c * h * i + 2 * r * (c + h) * i
    accums = 4 * (2 * c + r * (2 * c + 2 * h))
    return streams + temps + weights + accums


def _fwd_rows(sp: int, c: int, h: int, r: int, itemsize: int, batch: int) -> int:
    g = 0
    for cand in (8, 4, 2, 1):
        if _fwd_bytes(cand, sp, c, h, r, itemsize) <= _FWD_BUDGET:
            g = cand
            break
    while g > 1 and batch % g:
        g //= 2
    return g


def _fwd_plan(
    sp: int, c: int, h: int, r: int, itemsize: int, batch: int, streams: int,
) -> tuple[int, int]:
    """(g, kt): g whole samples per program when the sample fits, else one
    sample split into kt row chunks (the residual variant at stage-0
    geometry needs chunking: S=4096 with a third stream outgrows VMEM)."""
    g = 0
    for cand in (8, 4, 2, 1):
        if _fwd_bytes(cand, sp, c, h, r, itemsize, streams) <= _FWD_BUDGET:
            g = cand
            break
    while g > 1 and batch % g:
        g //= 2
    if g:
        return g, 1
    kt = 2
    while kt <= sp // 8:
        if sp % kt == 0 and (sp // kt) % 8 == 0 and _fwd_bytes(
            1, sp // kt, c, h, r, itemsize, streams
        ) <= _FWD_BUDGET:
            return 1, kt
        kt *= 2
    return 0, 0


def _bwd_row_chunks(sp: int, c: int, h: int, r: int, itemsize: int) -> int:
    """Row chunks per sample (kt) so one chunk's working set fits."""
    kt = 1
    while kt <= sp // 8:
        if sp % kt == 0 and (sp // kt) % 8 == 0 and (
            _bwd_bytes(sp // kt, c, h, r, itemsize) <= _BWD_BUDGET
        ):
            return kt
        kt *= 2
    return 0


def _prep(p: ConvFFNParams, wdt):
    """Weights in compute dtype, vectors as f32 rows, masks f32."""
    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    return [
        vec(p.inv), vec(p.shift),
        p.w1.astype(wdt), vec(p.b1), p.w2.astype(wdt), vec(p.b2),
        p.a1.astype(wdt), p.b1l.astype(wdt), p.a2.astype(wdt), p.b2l.astype(wdt),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_convffn(y: Array, p: ConvFFNParams, s_lora: float) -> Array:
    """out = fc2(gelu(fc1(y*inv+shift) + lora1)) + lora2 over (B, S, C) rows.

    Differentiable in (y, inv, shift, a1, b1l, a2, b2l); the base fc1/fc2
    weights receive ZERO cotangents (frozen-backbone LoRA contract — see
    module docstring). The residual/LayerScale stays with the caller."""
    b, s, c = y.shape
    sp = -(-s // 8) * 8
    yp = jnp.pad(y, [(0, 0), (0, sp - s), (0, 0)]) if sp != s else y
    r = p.a1.shape[-1]
    h = p.w1.shape[-1]
    args = _prep(p, y.dtype)
    g = _fwd_rows(sp, c, h, r, y.dtype.itemsize, b)
    if g == 0:
        raise ValueError(
            f"fused_convffn forward does not fit VMEM at (S={s}, C={c}, "
            f"H={h}) — convffn_fused_enabled should have rejected this shape"
        )
    yspec = pl.BlockSpec((g, sp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # Masks ride as (B, 1, R): the unit middle axis keeps the last-two block
    # dims equal to the array dims (Mosaic's tiling constraint — a (g, R)
    # block with g < 8 on the sublane axis is rejected).
    mspec = pl.BlockSpec((g, 1, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_convffn_fwd_kernel, s_lora=s_lora),
        grid=(b // g,),
        in_specs=[yspec, mspec, mspec] + [_CONST(a) for a in args],
        out_specs=yspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, c), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sp * c * h,
            bytes_accessed=2 * b * sp * c * y.dtype.itemsize,
            transcendentals=b * sp * h,
        ),
        interpret=_dispatch_target()[0] != "tpu",
    )(
        yp,
        p.m1.astype(jnp.float32).reshape(b, 1, r),
        p.m2.astype(jnp.float32).reshape(b, 1, r),
        *args,
    )
    return out[:, :s, :] if sp != s else out


def _convffn_fwd(y, p, s_lora):
    return fused_convffn(y, p, s_lora), (y, p)


def _convffn_bwd(s_lora, residuals, df):
    y, p = residuals
    b, s, c = y.shape
    sp = -(-s // 8) * 8
    pad = [(0, 0), (0, sp - s), (0, 0)]
    yp = jnp.pad(y, pad) if sp != s else y
    dfp = jnp.pad(df, pad) if sp != s else df
    r = p.a1.shape[-1]
    h = p.w1.shape[-1]
    i = y.dtype.itemsize
    kt = _bwd_row_chunks(sp, c, h, r, i)
    if kt == 0:
        raise ValueError(
            f"fused_convffn backward does not fit VMEM at (S={s}, C={c}, "
            f"H={h}) — convffn_fused_enabled should have rejected this shape"
        )
    spt = sp // kt
    args = _prep(p, y.dtype)
    yspec = pl.BlockSpec(
        (1, spt, c), lambda i_: (i_ // kt, i_ % kt, 0), memory_space=pltpu.VMEM
    )
    mspec = pl.BlockSpec(
        (1, 1, r), lambda i_: (i_ // kt, 0, 0), memory_space=pltpu.VMEM
    )
    acc = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    aspec = lambda shape: pl.BlockSpec(
        shape, lambda i_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    dy, dinv, dshift, da1, db1l, da2, db2l = pl.pallas_call(
        functools.partial(_convffn_bwd_kernel, s_lora=s_lora),
        grid=(b * kt,),
        in_specs=[yspec, yspec, mspec, mspec] + [_CONST(a) for a in args],
        out_specs=[
            yspec, aspec((1, c)), aspec((1, c)), aspec((c, r)),
            aspec((r, h)), aspec((h, r)), aspec((r, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sp, c), y.dtype),
            acc((1, c)), acc((1, c)), acc((c, r)),
            acc((r, h)), acc((h, r)), acc((r, c)),
        ],
        interpret=_dispatch_target()[0] != "tpu",
    )(
        yp, dfp,
        p.m1.astype(jnp.float32).reshape(b, 1, r),
        p.m2.astype(jnp.float32).reshape(b, 1, r),
        *args,
    )
    zeros = lambda a: jnp.zeros_like(a)
    dp = ConvFFNParams(
        inv=dinv[0].astype(p.inv.dtype),
        shift=dshift[0].astype(p.shift.dtype),
        w1=zeros(p.w1), b1=zeros(p.b1), w2=zeros(p.w2), b2=zeros(p.b2),
        a1=da1.astype(p.a1.dtype), b1l=db1l.astype(p.b1l.dtype),
        a2=da2.astype(p.a2.dtype), b2l=db2l.astype(p.b2l.dtype),
        m1=zeros(p.m1), m2=zeros(p.m2),
    )
    return (dy[:, :s, :] if sp != s else dy), dp


fused_convffn.defvjp(_convffn_fwd, _convffn_bwd)


def _convffn_fwd_res_kernel(y_ref, res_ref, m1_ref, m2_ref, *args, s_lora):
    _convffn_fwd_kernel(
        y_ref, m1_ref, m2_ref, *args, s_lora=s_lora, res_ref=res_ref
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_convffn_res(y: Array, res: Array, p: ConvFFNParams, s_lora: float):
    """``res + fc2(gelu(fc1(y*inv+shift) + lora1)) + lora2`` — the ConvFFN
    chain with the block residual fused in, so the block output leaves the
    kernel directly (the fused-pair path's kernel C; models/fastvit.py).

    The caller folds LayerScale into (w2, b2, b2l) at the XLA parameter
    level, so ``res`` enters unscaled and its cotangent is the pass-through
    ``df`` (zero extra backward work). Same differentiability contract as
    :func:`fused_convffn` otherwise."""
    b, s, c = y.shape
    sp = -(-s // 8) * 8
    pad = [(0, 0), (0, sp - s), (0, 0)]
    yp = jnp.pad(y, pad) if sp != s else y
    rp = jnp.pad(res, pad) if sp != s else res
    r = p.a1.shape[-1]
    h = p.w1.shape[-1]
    args = _prep(p, y.dtype)
    g, kt = _fwd_plan(sp, c, h, r, y.dtype.itemsize, b, streams=3)
    if g == 0:
        raise ValueError(
            f"fused_convffn_res forward does not fit VMEM at (S={s}, C={c}, "
            f"H={h}) — the dispatch gate should have rejected this shape"
        )
    if kt == 1:
        grid = (b // g,)
        yspec = pl.BlockSpec(
            (g, sp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        mspec = pl.BlockSpec(
            (g, 1, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        grid = (b * kt,)
        spt = sp // kt
        yspec = pl.BlockSpec(
            (1, spt, c), lambda i: (i // kt, i % kt, 0), memory_space=pltpu.VMEM
        )
        mspec = pl.BlockSpec(
            (1, 1, r), lambda i: (i // kt, 0, 0), memory_space=pltpu.VMEM
        )
    out = pl.pallas_call(
        functools.partial(_convffn_fwd_res_kernel, s_lora=s_lora),
        grid=grid,
        in_specs=[yspec, yspec, mspec, mspec] + [_CONST(a) for a in args],
        out_specs=yspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, c), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sp * c * h,
            bytes_accessed=3 * b * sp * c * y.dtype.itemsize,
            transcendentals=b * sp * h,
        ),
        interpret=_dispatch_target()[0] != "tpu",
    )(
        yp, rp,
        p.m1.astype(jnp.float32).reshape(b, 1, r),
        p.m2.astype(jnp.float32).reshape(b, 1, r),
        *args,
    )
    return out[:, :s, :] if sp != s else out


def _convffn_res_fwd(y, res, p, s_lora):
    return fused_convffn_res(y, res, p, s_lora), (y, p)


def _convffn_res_bwd(s_lora, residuals, df):
    # The residual is additive: dres = df exactly; everything else is the
    # proven fused_convffn backward.
    y, p = residuals
    dy, dp = _convffn_bwd(s_lora, (y, p), df)
    return dy, df, dp


fused_convffn_res.defvjp(_convffn_res_fwd, _convffn_res_bwd)


def fused_convffn_res_sharded(
    y: Array, res: Array, p: ConvFFNParams, s_lora: float, mesh
) -> Array:
    """Pure-DP shard_map wrapper of the residual variant (see
    :func:`fused_convffn_sharded`)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    pspecs = ConvFFNParams(
        inv=P(), shift=P(), w1=P(), b1=P(), w2=P(), b2=P(),
        a1=P(), b1l=P(), a2=P(), b2l=P(), m1=P("data"), m2=P("data"),
    )
    return shard_map(
        lambda y_, r_, p_: fused_convffn_res(y_, r_, p_, s_lora),
        mesh=mesh, in_specs=(P("data"), P("data"), pspecs),
        out_specs=P("data"), check_rep=False,
    )(y, res, p)


def dispatch_convffn_res(y: Array, res: Array, p: ConvFFNParams, s_lora: float):
    """Single-device direct, shard_map on pure-DP meshes."""
    from dino_pose_tpu.ops.block import _dp_shard_mesh

    _, n_devices = _dispatch_target()
    if n_devices > 1:
        mesh = _dp_shard_mesh(y.shape[0])
        if mesh is None:
            import warnings

            warnings.warn(
                "dispatch_convffn_res: force-mode on a non-pure-DP "
                f"multi-device trace (n_devices={n_devices}) falls back to "
                "an unpartitionable bare kernel — only valid for unsharded "
                "operands",
                stacklevel=2,
            )
            return fused_convffn_res(y, res, p, s_lora)
        return fused_convffn_res_sharded(y, res, p, s_lora, mesh)
    return fused_convffn_res(y, res, p, s_lora)


def convffn_res_enabled(
    c: int, hidden: int, s: int, itemsize: int, train: bool, lora_rank: int,
    batch: int | None = None,
) -> bool:
    """Fit/contract gate for the residual variant, used as a component of
    the fused-pair path (the pair gate — ops/dwconv.py ``pair_enabled`` —
    owns the platform/topology checks; this one owns the ConvFFN-side
    contract: LoRA-frozen training and VMEM fit, honoring the same
    ``DINO_POSE_TPU_CONVFFN`` kill switch)."""
    override = os.environ.get("DINO_POSE_TPU_CONVFFN", "").lower()
    if override in ("0", "xla"):
        return False
    if train and lora_rank == 0:
        return False
    sp = -(-s // 8) * 8
    r = max(1, lora_rank)
    g, _ = _fwd_plan(sp, c, hidden, r, itemsize, batch or 1, streams=3)
    if g == 0:
        return False
    if train and _bwd_row_chunks(sp, c, hidden, r, itemsize) == 0:
        return False
    return True


def fused_convffn_sharded(y: Array, p: ConvFFNParams, s_lora: float, mesh) -> Array:
    """Pure-DP shard_map wrapper: batch rows (and the per-sample dropout
    masks) shard over 'data'; weights/affines replicate. Parameter
    cotangents sum via shard_map's transpose of the replicated specs
    (see ops/block.py ``fused_block_train_sharded``)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    pspecs = ConvFFNParams(
        inv=P(), shift=P(), w1=P(), b1=P(), w2=P(), b2=P(),
        a1=P(), b1l=P(), a2=P(), b2l=P(), m1=P("data"), m2=P("data"),
    )
    return shard_map(
        lambda y_, p_: fused_convffn(y_, p_, s_lora),
        mesh=mesh, in_specs=(P("data"), pspecs), out_specs=P("data"),
        check_rep=False,
    )(y, p)


def dispatch_convffn(y: Array, p: ConvFFNParams, s_lora: float) -> Array:
    """Single-device direct, shard_map on pure-DP meshes (the gate already
    rejected every other topology)."""
    from dino_pose_tpu.ops.block import _dp_shard_mesh

    _, n_devices = _dispatch_target()
    if n_devices > 1:
        mesh = _dp_shard_mesh(y.shape[0])
        if mesh is None:
            # Only reachable under DINO_POSE_TPU_CONVFFN=force (the normal
            # gate rejects non-pure-DP topologies): a bare pallas_call on a
            # SHARDED global array inside jit is not SPMD-partitionable.
            # Force-mode callers (CPU parity tests, microbenches) trace
            # unsharded local arrays, for which the bare kernel is correct —
            # warn so a sharded-trace misuse is attributable.
            import warnings

            warnings.warn(
                "dispatch_convffn: force-mode on a non-pure-DP multi-device "
                f"trace (n_devices={n_devices}, batch={y.shape[0]}) falls "
                "back to an unpartitionable bare kernel — only valid for "
                "unsharded (single-device or fully replicated) operands",
                stacklevel=2,
            )
            return fused_convffn(y, p, s_lora)
        return fused_convffn_sharded(y, p, s_lora, mesh)
    return fused_convffn(y, p, s_lora)


def convffn_fused_enabled(
    c: int, hidden: int, s: int, itemsize: int, train: bool, lora_rank: int,
    batch: int | None = None,
) -> bool:
    """Dispatch gate for the fused ConvFFN chain.

    Training requires ``lora_rank > 0``: the backward returns zero
    cotangents for the base fc1/fc2 (the reference's LoRA mode freezes the
    whole backbone, lora.py:151-166); FastViT's no-LoRA unfreeze mode
    trains those weights and must keep the XLA branch math. Eval is
    forward-only, so every configuration qualifies. Multi-device traces
    qualify only on pure-DP meshes (shard_map route).

    ``DINO_POSE_TPU_CONVFFN=0|xla`` disables; ``=force`` enables off-TPU
    (interpret mode — the CPU-parity test hook)."""
    override = os.environ.get("DINO_POSE_TPU_CONVFFN", "").lower()
    if override in ("0", "xla"):
        return False
    if train and lora_rank == 0:
        return False
    if override != "force":
        # Measured win window (t8 @ 256^2, bs=128, one v5e chip — see
        # PERFORMANCE.md "fused ConvFFN"): in isolation the kernel beats the
        # XLA chain at every stage (fwd+bwd 1.08/1.38/1.09/1.03x for
        # C=48/96/192/384), but in the full step the pallas_call boundary
        # costs XLA its neighbour fusions, so only the decisive middle-stage
        # wins survive end-to-end. Gate to those geometries.
        if not (64 <= c <= 256):
            return False
        platform, n_devices = _dispatch_target()
        if platform != "tpu":
            return False
        if n_devices > 1:
            from dino_pose_tpu.ops.block import _dp_shard_mesh

            if _dp_shard_mesh(
                batch if batch is not None else n_devices, quiet_tp=True
            ) is None:
                return False
    sp = -(-s // 8) * 8
    r = max(1, lora_rank)
    if _fwd_rows(sp, c, hidden, r, itemsize, batch or 1) == 0:
        return False
    if train and _bwd_row_chunks(sp, c, hidden, r, itemsize) == 0:
        return False
    return True
