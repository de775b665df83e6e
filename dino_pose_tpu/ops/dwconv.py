"""Lane-packed depthwise-conv kernels for the FastViT conv stages.

Motivation (PERFORMANCE.md "step attribution", scripts/probe_stage0_ops.py):
FastViT's stage-0 blocks are 44% of the t8 train step, and the probe shows
why — every activation op runs at C=48 channels, filling 48/128 = 37.5% of
the TPU's vector lanes, and XLA's grouped-conv lowering of the 7x7 depthwise
conv alone costs 1.6 ms/application (~13x its HBM-bandwidth bound). The
reference inherits these convs from timm's FastViT
(/root/reference/model/fastvit_pose.py:21).

The fix is a LAYOUT, not new math: view the NHWC activation (B, H, W, C) as
(B, H, W*C). That view is a free reshape of the same HBM bytes, and the
fused (W*C) minor axis fills the 128-wide vector lanes completely (t8
stage0: W*C = 64*48 = 3072 = 24 full vregs per row). In this view a
depthwise conv becomes, per (dh, dw) tap,

    acc[h, l] += k[dh, dw, l % C] * xpad[h + dh, l + (dw - p) * C]

i.e. H-taps are sublane(row)-offset reads of a zero-padded VMEM scratch and
W-taps are *lane rotations by (dw - p) * C* — ``pltpu.roll`` — with a static
mask zeroing the lanes whose source column wrapped across the row edge
(zero 'SAME' padding). Per-channel tap weights broadcast along lanes as
W-tiled rows. Everything runs at 100% lane fill in f32.

Backward contract: the conv *kernel* gets a ZERO cotangent — every FastViT
backbone conv is frozen in every training mode this framework supports
(train/partition.py: fastvit trains pose heads + LoRA adapters only;
reference fastvit_pose.py:38-41,122-124) — while dx is exact: the transpose
of a stride-1 SAME depthwise conv is the same conv with the spatially
flipped kernel, so the backward reuses the forward kernel body.

Dispatch: :func:`dwconv_enabled` + :func:`dispatch_dw_conv` follow the
``ops/convffn.py`` pattern (TPU-only unless forced, pure-DP shard_map on
multi-device meshes, VMEM-fit model, env override ``DINO_POSE_TPU_DWCONV``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dino_pose_tpu.ops.block import _CONST
from dino_pose_tpu.ops.dispatch import target as _dispatch_target

Array = jax.Array


def _dw_kernel(x_ref, mtaps_ref, out_ref, xp_ref, rm_ref, acc_ref, *,
               kk: int, c: int, h: int, wc: int, g: int):
    """One program: ``g`` samples' (H, W*C) planes through a kk x kk
    stride-1 SAME depthwise conv at full lane fill (module docstring).

    The row-edge masks are pre-folded into the tap vectors (``mtaps`` row
    dh*kk+dw = tile(k[dh, dw, :], W) * edge_mask[dw]) so each dw costs one
    lane roll plus a single fused 7-term FMA expression; accumulation is
    in-place in an f32 scratch — a value-chain accumulator makes Mosaic's
    stack allocator hold several live (H, W*C) f32 copies and blows the
    16 MB scoped-VMEM limit at stage-0 shapes."""
    p = kk // 2
    for s in range(g):
        if p:
            xp_ref[:p] = jnp.zeros((p, wc), jnp.float32)
            xp_ref[p + h:] = jnp.zeros((p, wc), jnp.float32)
        xp_ref[p:p + h] = x_ref[s].astype(jnp.float32)
        _tap_conv(xp_ref, rm_ref, acc_ref, mtaps_ref, kk=kk, c=c, h=h, wc=wc)
        out_ref[s] = acc_ref[...].astype(out_ref.dtype)


def _tap_conv(xp_ref, rm_ref, acc_ref, mtaps_ref, *, kk, c, h, wc):
    """acc = kk x kk tap conv of the padded plane in ``xp_ref``.

    One lane roll per dw (dynamic shift), then the kk dh-taps as fused
    row-chunk FMA chains. A real loop (not unrolled python) keeps ONE
    iteration's temporaries live — unrolled, Mosaic's stack allocator sums
    the roll/chain temps across iterations and blows the 16 MB scoped-VMEM
    limit at stage shapes."""
    p = kk // 2
    ch = min(h, 16)  # row-chunked tap chains bound the live f32 temps
    acc_ref[...] = jnp.zeros((h, wc), jnp.float32)

    def dw_body(dw, carry):
        sh = ((p - dw) * c) % wc
        rm_ref[...] = pltpu.roll(xp_ref[...], sh, 1)
        for r in range(0, h, ch):
            part = rm_ref[r:r + ch] * mtaps_ref[pl.ds(dw, 1)]
            for dh in range(1, kk):
                part = part + rm_ref[r + dh:r + dh + ch] * mtaps_ref[
                    pl.ds(dh * kk + dw, 1)
                ]
            acc_ref[r:r + ch] += part
        return carry

    jax.lax.fori_loop(0, kk, dw_body, 0)


def _prep_taps(kernel: Array, w: int, c: int) -> Array:
    """Masked tap rows (kk*kk, W*C): row dh*kk+dw is k[dh, dw, :] tiled W
    times along lanes, zeroed where the lane's source column (w + dw - p)
    falls outside [0, W) — the rolled value wrapped across the row edge
    there, and folding the edge mask into the tap makes it vanish."""
    kk = kernel.shape[0]
    p = kk // 2
    kf = kernel.reshape(kk * kk, c).astype(jnp.float32)
    taps = jnp.tile(kf, (1, w))
    wpos = np.arange(w * c) // c
    masks = np.stack([
        ((wpos + dw - p >= 0) & (wpos + dw - p < w)) for dw in range(kk)
    ]).astype(np.float32)
    return taps * jnp.asarray(np.tile(masks, (kk, 1)))


_DW_BUDGET = 9 * 1024 * 1024


def _dw_bytes(g: int, kk: int, h: int, wc: int, itemsize: int) -> int:
    hp = h + 2 * (kk // 2)
    streams = 2 * (2 * g * h * wc * itemsize)            # x in + out, 2x-buffered
    scratch = 2 * hp * wc * 4 + h * wc * 4               # xp + rm + acc refs
    temps = 4 * min(h, 16) * wc * 4                      # chunked chain live set
    consts = kk * kk * wc * 4
    return streams + scratch + temps + consts


def _dw_rows(kk: int, h: int, wc: int, itemsize: int, batch: int) -> int:
    for cand in (8, 4, 2, 1):
        if batch % cand == 0 and _dw_bytes(cand, kk, h, wc, itemsize) <= _DW_BUDGET:
            return cand
    return 0


def _dw_call(x4: Array, kernel: Array) -> Array:
    """(B, H, W, C) through the lane-packed kernel; kernel (kk, kk, 1, C)."""
    b, h, w, c = x4.shape
    kk = kernel.shape[0]
    wc = w * c
    x = x4.reshape(b, h, wc)
    mtaps = _prep_taps(kernel, w, c)
    g = _dw_rows(kk, h, wc, x.dtype.itemsize, b)
    if g == 0:
        raise ValueError(
            f"dw_conv does not fit VMEM at (H={h}, W={w}, C={c}, k={kk}) — "
            "dwconv_enabled should have rejected this shape"
        )
    spec = pl.BlockSpec((g, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    p = kk // 2
    out = pl.pallas_call(
        functools.partial(_dw_kernel, kk=kk, c=c, h=h, wc=wc, g=g),
        grid=(b // g,),
        in_specs=[spec, _CONST(mtaps)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, wc), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * p, wc), jnp.float32),
            pltpu.VMEM((h + 2 * p, wc), jnp.float32),
            pltpu.VMEM((h, wc), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wc * kk * kk,
            bytes_accessed=2 * b * h * wc * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_dispatch_target()[0] != "tpu",
    )(x, mtaps)
    return out.reshape(b, h, w, c)


@jax.custom_vjp
def dw_conv_frozen(x: Array, kernel: Array) -> Array:
    """Stride-1 SAME depthwise conv (multiplier 1, NHWC x, HWIO (k,k,1,C)
    kernel) with exact dx and a ZERO kernel cotangent (frozen-backbone
    contract — module docstring)."""
    return _dw_call(x, kernel)


def _dw_fwd(x, kernel):
    return _dw_call(x, kernel), kernel


def _dw_bwd(kernel, df):
    # Transpose of stride-1 SAME conv = same conv with the flipped kernel.
    return _dw_call(df, jnp.flip(kernel, (0, 1))), jnp.zeros_like(kernel)


dw_conv_frozen.defvjp(_dw_fwd, _dw_bwd)


def dw_conv_sharded(x: Array, kernel: Array, mesh) -> Array:
    """Pure-DP shard_map wrapper: batch shards over 'data', kernel
    replicates (cotangent handling as ops/convffn.py's sharded wrapper)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        dw_conv_frozen, mesh=mesh,
        in_specs=(P("data"), P()), out_specs=P("data"),
        check_rep=False,
    )(x, kernel)


def dispatch_dw_conv(x: Array, kernel: Array) -> Array:
    """Single-device direct; shard_map on pure-DP meshes (the gate already
    rejected every other topology)."""
    from dino_pose_tpu.ops.block import _dp_shard_mesh

    _, n_devices = _dispatch_target()
    if n_devices > 1:
        mesh = _dp_shard_mesh(x.shape[0])
        if mesh is None:
            import warnings

            warnings.warn(
                "dispatch_dw_conv: force-mode on a non-pure-DP multi-device "
                f"trace (n_devices={n_devices}, batch={x.shape[0]}) falls "
                "back to an unpartitionable bare kernel — only valid for "
                "unsharded operands",
                stacklevel=2,
            )
            return dw_conv_frozen(x, kernel)
        return dw_conv_sharded(x, kernel, mesh)
    return dw_conv_frozen(x, kernel)


def dwconv_enabled(
    c: int, h: int, w: int, kk: int, itemsize: int, batch: int | None = None,
) -> bool:
    """Dispatch gate for the lane-packed depthwise conv.

    Valid for stride-1, multiplier-1 depthwise convs on FROZEN kernels
    (every FastViT training mode — train/partition.py). The kernel needs
    C < 128 (lane-fill premise), H a sublane multiple and W*C 128-aligned
    (Mosaic's dynamic lane roll).

    DEFAULT OFF: the round-5 in-situ A/B (scripts/ab_train_step.py,
    PERFORMANCE.md) measured the per-op dispatch at a 26% END-TO-END
    REGRESSION on the t8 step (78.6 vs 62.5 ms) even though the kernel wins
    1.5x in isolation — each standalone pallas_call boundary costs XLA its
    neighbour fusions at ~10 sites/step, re-confirming the round-4 ConvFFN
    lesson at per-op granularity. The tap machinery lives on inside the
    segment-scale fused kernels (combine+dw7 pair); this solo dispatch is
    kept as the measured A/B arm: ``DINO_POSE_TPU_DWCONV=on`` enables on
    TPU, ``force`` enables anywhere (interpret parity hook), ``0|xla`` is
    the default."""
    override = os.environ.get("DINO_POSE_TPU_DWCONV", "").lower()
    if override not in ("on", "force"):
        return False
    if override != "force":
        if not (c < 128 and h % 8 == 0 and w * c % 128 == 0):
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
    return _dw_rows(kk, h, w * c, itemsize, batch or 1) > 0


# ---------------------------------------------------------------------------
# Fused [RepMixer-combine -> ConvFFN depthwise conv] segment kernel.
#
# In the reuse train form the whole span between the two batch-stat barriers
# of a RepMixer+ConvFFN block is
#
#     x2 = a * x + b * y0 + bias        # RepMixer output as per-channel
#                                       # affine combine (models/fastvit.py)
#     y7 = dwconv7x7(x2)                # ConvFFN's depthwise conv
#
# with a = 1 + ls*(xc_m - xc_n), b = ls*inv0, bias = ls*(bias_m - bias_n)
# all (C,) functions of the already-reduced statistics. One kernel swallows
# the segment: the combine runs at full lane fill and x2 never makes an
# extra HBM round trip between the combine and the conv. Backward is the
# exact transpose: dx2 = dx2bar + corr7(dy7bar), dx = a*dx2, dy0 = b*dx2,
# plus per-channel reductions for (da, db, dbias); the conv kernel is
# frozen (zero cotangent) as everywhere in this module.


def _combine_dw_fwd_kernel(
    x_ref, y0_ref, a_ref, b_ref, bias_ref, mtaps_ref, x2_ref, y7_ref,
    xp_ref, rm_ref, acc_ref, *, kk: int, c: int, h: int, wc: int, g: int,
):
    p = kk // 2
    for s in range(g):
        x2f = (
            x_ref[s].astype(jnp.float32) * a_ref[0]
            + y0_ref[s].astype(jnp.float32) * b_ref[0]
            + bias_ref[0]
        )
        x2b = x2f.astype(x2_ref.dtype)
        x2_ref[s] = x2b
        if p:
            xp_ref[:p] = jnp.zeros((p, wc), jnp.float32)
            xp_ref[p + h:] = jnp.zeros((p, wc), jnp.float32)
        # The conv consumes the compute-dtype-rounded x2 — parity with the
        # unfused path, where the ConvFFN conv reads the cast block output.
        xp_ref[p:p + h] = x2b.astype(jnp.float32)
        _tap_conv(xp_ref, rm_ref, acc_ref, mtaps_ref, kk=kk, c=c, h=h, wc=wc)
        y7_ref[s] = acc_ref[...].astype(y7_ref.dtype)


def _combine_dw_bwd_kernel(
    x_ref, y0_ref, dx2_ref, dy7_ref, a_ref, b_ref, mtaps_ref,
    dx_ref, dy0_ref, da_ref, db_ref, dbias_ref,
    xp_ref, rm_ref, acc_ref, *, kk: int, c: int, h: int, wc: int,
):
    """One sample per program; ``mtaps_ref`` is the FLIPPED tap table (the
    transpose of a stride-1 SAME conv). Coefficient cotangents accumulate
    in VMEM across the sequential grid as (1, W*C) rows (reduced to (C,)
    outside)."""
    i = pl.program_id(0)
    p = kk // 2
    if p:
        xp_ref[:p] = jnp.zeros((p, wc), jnp.float32)
        xp_ref[p + h:] = jnp.zeros((p, wc), jnp.float32)
    xp_ref[p:p + h] = dy7_ref[0].astype(jnp.float32)
    _tap_conv(xp_ref, rm_ref, acc_ref, mtaps_ref, kk=kk, c=c, h=h, wc=wc)
    dx2 = dx2_ref[0].astype(jnp.float32) + acc_ref[...]
    dx_ref[0] = (dx2 * a_ref[0]).astype(dx_ref.dtype)
    dy0_ref[0] = (dx2 * b_ref[0]).astype(dy0_ref.dtype)

    @pl.when(i == 0)
    def _init():
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    da_ref[...] += jnp.sum(
        dx2 * x_ref[0].astype(jnp.float32), axis=0, keepdims=True
    )
    db_ref[...] += jnp.sum(
        dx2 * y0_ref[0].astype(jnp.float32), axis=0, keepdims=True
    )
    dbias_ref[...] += jnp.sum(dx2, axis=0, keepdims=True)


def _tile_vec(v: Array, w: int, c: int) -> Array:
    """(C,) -> (1, W*C) lane row matching the fused-view layout l = w*C+c."""
    return jnp.tile(v.astype(jnp.float32).reshape(1, c), (1, w))


def _pair_bytes(g: int, kk: int, h: int, wc: int, itemsize: int) -> int:
    hp = h + 2 * (kk // 2)
    streams = 4 * (2 * g * h * wc * itemsize)        # x, y0 in; x2, y7 out
    scratch = 2 * hp * wc * 4 + h * wc * 4
    temps = 2 * h * wc * 4 + 4 * min(h, 16) * wc * 4  # combine + chain chunks
    consts = (kk * kk + 3) * wc * 4
    return streams + scratch + temps + consts


def _pair_rows(kk: int, h: int, wc: int, itemsize: int, batch: int) -> int:
    for cand in (8, 4, 2, 1):
        if batch % cand == 0 and _pair_bytes(cand, kk, h, wc, itemsize) <= _DW_BUDGET:
            return cand
    return 0


def _combine_dw_call(x4, y04, a, b_, bias, kernel):
    b, h, w, c = x4.shape
    kk = kernel.shape[0]
    wc = w * c
    x = x4.reshape(b, h, wc)
    y0 = y04.reshape(b, h, wc)
    mtaps = _prep_taps(kernel, w, c)
    at, bt, biast = (_tile_vec(v, w, c) for v in (a, b_, bias))
    g = _pair_rows(kk, h, wc, x.dtype.itemsize, b)
    if g == 0:
        raise ValueError(
            f"combine_dw does not fit VMEM at (H={h}, W={w}, C={c}, k={kk})"
            " — the dispatch gate should have rejected this shape"
        )
    spec = pl.BlockSpec((g, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    p = kk // 2
    x2, y7 = pl.pallas_call(
        functools.partial(_combine_dw_fwd_kernel, kk=kk, c=c, h=h, wc=wc, g=g),
        grid=(b // g,),
        in_specs=[spec, spec] + [_CONST(v) for v in (at, bt, biast, mtaps)],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wc), x.dtype),
            jax.ShapeDtypeStruct((b, h, wc), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2 * p, wc), jnp.float32),
            pltpu.VMEM((h + 2 * p, wc), jnp.float32),
            pltpu.VMEM((h, wc), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wc * (kk * kk + 2),
            bytes_accessed=4 * b * h * wc * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_dispatch_target()[0] != "tpu",
    )(x, y0, at, bt, biast, mtaps)
    return x2.reshape(x4.shape), y7.reshape(x4.shape)


@jax.custom_vjp
def combine_dw_frozen(x, y0, a, b, bias, kernel):
    """(x2, y7) = (a*x + b*y0 + bias, dwconv_kk(x2)) in one VMEM pass.

    Differentiable in (x, y0, a, b, bias); the conv ``kernel`` gets a ZERO
    cotangent (frozen-backbone contract — module docstring)."""
    return _combine_dw_call(x, y0, a, b, bias, kernel)


def _combine_dw_vjp_fwd(x, y0, a, b, bias, kernel):
    return _combine_dw_call(x, y0, a, b, bias, kernel), (x, y0, a, b, kernel)


def _combine_dw_vjp_bwd(res, cts):
    x4, y04, a, b_, kernel = res
    dx2bar, dy7bar = cts
    bsz, h, w, c = x4.shape
    kk = kernel.shape[0]
    wc = w * c
    mtaps_t = _prep_taps(jnp.flip(kernel, (0, 1)), w, c)
    at, bt = _tile_vec(a, w, c), _tile_vec(b_, w, c)
    spec = pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec = lambda: jax.ShapeDtypeStruct((1, wc), jnp.float32)
    vspec = pl.BlockSpec((1, wc), lambda i: (0, 0), memory_space=pltpu.VMEM)
    p = kk // 2
    dx, dy0, da_t, db_t, dbias_t = pl.pallas_call(
        functools.partial(_combine_dw_bwd_kernel, kk=kk, c=c, h=h, wc=wc),
        grid=(bsz,),
        in_specs=[spec] * 4 + [_CONST(v) for v in (at, bt, mtaps_t)],
        out_specs=[spec, spec, vspec, vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, wc), x4.dtype),
            jax.ShapeDtypeStruct((bsz, h, wc), x4.dtype),
            vec(), vec(), vec(),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2 * p, wc), jnp.float32),
            pltpu.VMEM((h + 2 * p, wc), jnp.float32),
            pltpu.VMEM((h, wc), jnp.float32),
        ],
        interpret=_dispatch_target()[0] != "tpu",
    )(
        x4.reshape(bsz, h, wc), y04.reshape(bsz, h, wc),
        dx2bar.reshape(bsz, h, wc), dy7bar.reshape(bsz, h, wc),
        at, bt, mtaps_t,
    )
    reduce_c = lambda t, ref: t.reshape(w, c).sum(0).astype(ref.dtype)
    return (
        dx.reshape(x4.shape), dy0.reshape(x4.shape),
        reduce_c(da_t, a), reduce_c(db_t, b_),
        reduce_c(dbias_t, b_), jnp.zeros_like(kernel),
    )


combine_dw_frozen.defvjp(_combine_dw_vjp_fwd, _combine_dw_vjp_bwd)


def combine_dw_sharded(x, y0, a, b, bias, kernel, mesh):
    """Pure-DP shard_map wrapper: batch shards over 'data'; coefficient
    vectors and the conv kernel replicate (shard_map's transpose sums the
    replicated-spec cotangents — see ops/block.py)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        combine_dw_frozen, mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P(), P(), P()),
        out_specs=(P("data"), P("data")),
        check_rep=False,
    )(x, y0, a, b, bias, kernel)


def dispatch_combine_dw(x, y0, a, b, bias, kernel):
    """Single-device direct; shard_map on pure-DP meshes (the gate already
    rejected every other topology)."""
    from dino_pose_tpu.ops.block import _dp_shard_mesh

    _, n_devices = _dispatch_target()
    if n_devices > 1:
        mesh = _dp_shard_mesh(x.shape[0])
        if mesh is None:
            import warnings

            warnings.warn(
                "dispatch_combine_dw: force-mode on a non-pure-DP "
                f"multi-device trace (n_devices={n_devices}) falls back to "
                "an unpartitionable bare kernel — only valid for unsharded "
                "operands",
                stacklevel=2,
            )
            return combine_dw_frozen(x, y0, a, b, bias, kernel)
        return combine_dw_sharded(x, y0, a, b, bias, kernel, mesh)
    return combine_dw_frozen(x, y0, a, b, bias, kernel)


def pair_enabled(
    c: int, h: int, w: int, kk: int, itemsize: int, batch: int | None = None,
) -> bool:
    """Dispatch gate for the fused combine+dwconv segment.

    Same hardware window as the solo kernel (C < 128 lane-fill premise,
    sublane-multiple H, 128-aligned W*C for Mosaic's dynamic roll, frozen
    conv kernels — every FastViT training mode). Swallows the whole
    barrier-to-barrier segment — the granularity the round-5 per-op A/B
    showed is necessary — but the first cut still measured 69.3 vs 62.6
    ms/step on t8 (PERFORMANCE.md round-5), so it stays opt-in pending the
    attribution work: ``DINO_POSE_TPU_STAGE_PAIR=on`` enables on TPU,
    ``force`` enables anywhere (interpret parity hook)."""
    override = os.environ.get("DINO_POSE_TPU_STAGE_PAIR", "").lower()
    if override not in ("on", "force"):
        return False
    if override != "force":
        if not (c < 128 and h % 8 == 0 and w * c % 128 == 0):
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
    return _pair_rows(kk, h, w * c, itemsize, batch or 1) > 0
