"""Train-time structural reparameterisation folding for FastViT blocks.

The multi-branch MobileOne blocks (/root/reference's timm FastViT trains
them in branch form: kxk conv + BN, 1x1 scale + BN, identity BN) are the
dominant cost of the FastViT train step on TPU: the round-3 device trace
(PERFORMANCE.md "FastViT on the TPU") shows a long tail of per-branch
conv/BatchNorm fusions, each a separate HBM round trip.

Key algebra: BatchNorm *with batch statistics* is still an affine map of
its input once (mu, var) are known — exactly the deploy-time fusion
(``fuse_mobileone_params``) but with data-dependent statistics computed in
the same step. So a train-mode multi-branch block collapses to

    1. one real conv per kxk branch, used ONLY for its batch statistics
       (scale/identity branch statistics come from per-channel moments of
       the input — no materialised branch output at all);
    2. a tiny per-channel fold of every branch's (kernel, BN affine) into
       ONE equivalent kxk kernel + bias;
    3. a single folded conv that produces the block output.

This is a pure-XLA restructuring — mathematically the same function, so
autodiff gives the same gradients. In eval mode (running statistics) the
statistics convs disappear entirely and every MobileOne block becomes
exactly one conv, without the explicit deploy-time parameter transform —
that is the unambiguous win and the eval default.

In TRAIN mode the round-4 hardware A/B grid (PERFORMANCE.md) showed the
full fold is a 17% END-TO-END REGRESSION: the folded kernel depends on x
through the batch statistics, so reaching dx in backward requires the
full weight-gradient correlation conv per block — work branch math never
does for a frozen backbone. The measured-fastest train arrangement (and
default) is branch-output REUSE (``stats_branch_reuse``): run each branch
conv once, apply its BN as an elementwise affine of the already-
materialised output, and collapse scale/identity branches to per-channel
coefficients on x. See ``train_block_mode`` / ``ffn_fold_active`` for the
numbers and env hooks.

Parameter trees are unchanged in every mode: the param holders below
reproduce ``nn.layers.Conv`` / ``nn.layers.BatchNorm`` names, shapes and
initialisers, so checkpoints and the torch bridge are unaffected.

Master gate: ``DINO_POSE_TPU_FASTVIT_FOLD`` (default on; set ``0`` to
force the reference branch-form math everywhere).
"""

from __future__ import annotations

import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dino_pose_tpu.nn.layers import (
    _conv_fan_in,
    _dense_fan_in,
    torch_kaiming_uniform,
    uniform_bound,
)

Array = jax.Array


def fold_enabled() -> bool:
    """Master gate: ``DINO_POSE_TPU_FASTVIT_FOLD=0`` forces the literal
    reference branch math everywhere (train AND eval)."""
    return os.environ.get("DINO_POSE_TPU_FASTVIT_FOLD", "1") != "0"


def train_block_mode() -> str:
    """TRAIN-mode math for the MobileOne block family (MobileOneBlock,
    ReparamLargeKernelConv, RepMixer): ``branch`` | ``fold`` | ``reuse``.

    Measured on one v5e chip (fastvit_t8 production train step, bs=128,
    interleaved repeated A/B, PERFORMANCE.md round 4), combined with the
    FFN-fold axis (:func:`ffn_fold_active`):

    - ``reuse`` + branch FFN (DEFAULTS) — branch outputs feed their BN
      affines elementwise, scale/identity branches become per-channel
      coefficients on x, no folded conv: **2027 img/s**.
    - ``branch`` — the reference's literal multi-branch math: 1872-1881.
    - ``reuse`` + folded FFN: 1844-1851.
    - ``fold``  + folded FFN: 1552-1558. Merging the branches into one kxk
      conv in train mode makes the folded kernel depend on x through the
      batch statistics, so the backward must form a full weight-gradient
      correlation conv per block just to reach dx — a 17% END-TO-END
      regression even though it runs fewer forward convs. Kept only as the
      measured A/B point.

    Eval mode always folds (one conv per block, no statistics convs, no
    backward) — that is where the reparameterisation algebra is free.
    """
    mode = os.environ.get("DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS", "reuse").lower()
    if mode not in ("branch", "fold", "reuse"):
        raise ValueError(
            f"DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS={mode!r}: expected branch|fold|reuse"
        )
    return mode


def block_fold_active(train: bool) -> bool:
    """Should the MobileOne family take its folded/reuse path?"""
    if not fold_enabled():
        return False
    return (not train) or train_block_mode() != "branch"


def block_reuse_active(train: bool) -> bool:
    """Within the folded path, should train mode reuse branch outputs?"""
    return train and train_block_mode() == "reuse"


def ffn_fold_active(train: bool) -> bool:
    """Fold gate for the affine-into-matmul sites (ConvFFN's post-depthwise
    BN -> fc1, SpatialAttention's pre-norm BN -> qkv).

    Forward-only they are free (the BN affine rides the existing matmul),
    but in TRAIN mode they lose ~4.5% end-to-end (1872 -> 1788 img/s on
    t8): the backbone's fc1/qkv are FROZEN, so branch math never computes
    their weight gradients — while the folded kernel depends on the batch
    statistics, forcing a full dL/dW correlation matmul per site just to
    reach the statistics' cotangent. Default: fold in eval, branch in
    train; ``DINO_POSE_TPU_FASTVIT_TRAIN_FFN=fold`` is the A/B hook."""
    if not fold_enabled():
        return False
    if not train:
        return True
    return os.environ.get("DINO_POSE_TPU_FASTVIT_TRAIN_FFN", "branch").lower() == "fold"


class ConvParams(nn.Module):
    """Kernel-only param holder matching ``nn.layers.Conv`` (name 'kernel',
    torch kaiming-uniform init, HWIO layout)."""

    features: int
    kernel_size: tuple[int, int]
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, in_features: int) -> Array:
        kh, kw = self.kernel_size
        shape = (kh, kw, in_features // self.feature_group_count, self.features)
        return self.param("kernel", torch_kaiming_uniform(_conv_fan_in), shape)


class ZeroConvParams(nn.Module):
    """Kernel-only zero-initialised conv holder (matches ``nn.Conv`` with
    ``kernel_init=zeros`` — the LoRA ``lora_B`` convention)."""

    features: int
    kernel_size: tuple[int, int]

    @nn.compact
    def __call__(self, in_features: int) -> Array:
        kh, kw = self.kernel_size
        return self.param(
            "kernel", nn.initializers.zeros,
            (kh, kw, in_features, self.features),
        )


class DenseConvParams(nn.Module):
    """Kernel+bias holder matching a biased ``nn.layers.Conv``."""

    features: int
    kernel_size: tuple[int, int]

    @nn.compact
    def __call__(self, in_features: int) -> tuple[Array, Array]:
        kh, kw = self.kernel_size
        shape = (kh, kw, in_features, self.features)
        kernel = self.param("kernel", torch_kaiming_uniform(_conv_fan_in), shape)
        fan_in = max(1, kh * kw * in_features)
        bias = self.param(
            "bias", uniform_bound(1.0 / math.sqrt(fan_in)), (self.features,)
        )
        return kernel, bias


class DenseParams(nn.Module):
    """Kernel-only param holder matching a bias-free ``nn.layers.Dense``
    (name 'kernel', torch kaiming-uniform init, (in, out) layout)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> Array:
        return self.param(
            "kernel",
            torch_kaiming_uniform(_dense_fan_in),
            (in_features, self.features),
        )


class BNAffine(nn.Module):
    """BatchNorm param/stat holder returning the affine (inv, shift) such
    that ``BN(y) = y * inv + shift``.

    Matches ``nn.layers.BatchNorm`` semantics exactly: biased batch
    variance for normalisation, unbiased for the running update, momentum
    0.1, float32 statistics, running stats in 'batch_stats'. In train mode
    the caller supplies the branch output's batch (mean, var) and the
    reduction count ``n``; in eval mode the running statistics are used.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        batch_mean: Array | None = None,
        batch_var: Array | None = None,
        n: int | None = None,
        *,
        train: bool,
    ) -> tuple[Array, Array]:
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        if train:
            mean, var = batch_mean, batch_var
            unbiased = var * (n / max(1, n - 1))
            if not self.is_initializing():
                ra_mean.value = (
                    1 - self.momentum
                ) * ra_mean.value + self.momentum * mean
                ra_var.value = (
                    1 - self.momentum
                ) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return inv, bias - mean * inv


def channel_moments(x: Array, strides: tuple[int, int] = (1, 1)):
    """Per-channel f32 (mean, mean-of-square, count) over N,H,W — on the
    branch's *output* grid, i.e. the stride-sampled positions.

    One-pass moments (var = m2 - mean^2, see ``branch_stats``): exact
    algebraically but subject to cancellation if a channel mean grows much
    larger than its std. Every consumer (reuse skip/scale branches, the
    fold path) feeds BN-bounded activations where means stay O(1), and the
    parity tests pin the tolerance; revisit if a consumer ever feeds
    un-normalised activations."""
    sh, sw = strides
    if (sh, sw) != (1, 1):
        x = x[:, ::sh, ::sw, :]
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(0, 1, 2))
    m2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
    return m, m2, x.shape[0] * x.shape[1] * x.shape[2]


def branch_stats(y: Array):
    """f32 (mean, biased var, count) of a materialised branch output.

    Two-pass (shifted) variance, matching ``nn.layers.BatchNorm``; the
    moment shortcuts in :func:`channel_moments` are inherently one-pass
    (that is the trick) and acceptable for post-normalisation activations
    with modest means."""
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(yf - mean), axis=(0, 1, 2))
    return mean, var, y.shape[0] * y.shape[1] * y.shape[2]


def _center_identity(kh: int, kw: int, in_g: int, features: int) -> np.ndarray:
    """Static centred-dirac mask: identity branch as a kxk grouped kernel
    (mirrors fuse_mobileone_params' construction)."""
    ident = np.zeros((kh, kw, in_g, features), np.float32)
    for o in range(features):
        ident[kh // 2, kw // 2, o % in_g, o] = 1.0
    return ident


def fold_stats_branch(
    x: Array,
    kernel: Array,
    bn: BNAffine,
    *,
    k: int,
    strides: tuple[int, int],
    groups: int,
    train: bool,
) -> tuple[Array, Array]:
    """Fold one (conv kernel, BatchNorm) branch into a kxk-kernel term.

    In train mode the branch output is materialised ONCE, only for its
    batch statistics (the branch-BN-as-affine algebra in the module
    docstring); eval mode uses the running statistics and runs no conv.
    The branch's own kernel size ``bk <= k`` is zero-padded to the centre
    of the kxk accumulator (offsets align: both convs pad to half their
    kernel). Returns f32 (kernel_term, bias_term) to accumulate.

    Shared by ``MobileOneBlock`` (bk == k conv branches) and
    ``ReparamLargeKernelConv`` (small kernel inside the large one).
    """
    bk = kernel.shape[0]
    if train:
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=strides,
            padding=[(bk // 2, bk // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        mean, var, n = branch_stats(y)
        inv, shift = bn(mean, var, n, train=True)
    else:
        inv, shift = bn(train=False)
    pad = ((k - bk) // 2, (k - bk) - (k - bk) // 2)
    return (
        jnp.pad(kernel.astype(jnp.float32) * inv, (pad, pad, (0, 0), (0, 0))),
        shift,
    )


def _parity_bwd_dx(dy: Array, kernel: Array, cin: int, h: int, w: int) -> Array:
    """dx of a stride-2 SAME depthwise(-multiplier) conv as FOUR stride-1
    grouped convs on dy (one per output-pixel parity class) + an interleave.

    XLA lowers the transposed grouped conv to an input-dilated conv with a
    degenerate batch-minor T(1,128) layout — the round-5 trace put the
    three PatchEmbed conv backwards at 3.24/1.61/0.81 ms of the 63 ms t8
    step. Splitting dx by (u, v) parity turns each class into a plain
    stride-1 NHWC grouped conv (the strong path) over the kernel taps of
    matching parity:

        dx[2i'+ph, 2j'+pw, c] = sum_{kh,kw,m: parity match}
            k[kh, kw, 0, c*M+m] * dy[i'+(p-kh+ph)/2, j'+(p-kw+pw)/2, c*M+m]

    Validated numerically against the autodiff transpose
    (tests/test_fastvit_fold.py).
    """
    kk = kernel.shape[0]
    p = kk // 2
    cout = kernel.shape[-1]
    mult = cout // cin
    kf = kernel.reshape(kk, kk, cout).astype(dy.dtype)
    parts = []
    for ph in range(2):
        row = []
        for pw in range(2):
            khs = [kh for kh in range(kk) if (ph + p - kh) % 2 == 0]
            kws = [kw for kw in range(kk) if (pw + p - kw) % 2 == 0]
            ksub = kf[jnp.asarray(khs)][:, jnp.asarray(kws)]
            # HWIO for the grouped dy->dx conv: out channel c reads in
            # channels [c*M, (c+1)*M) -> kernel[..., m, c]; tap reversal
            # turns the correlation into a conv.
            kio = jnp.flip(
                ksub.reshape(len(khs), len(kws), cin, mult), (0, 1)
            ).transpose(0, 1, 3, 2)
            # dy index for tap kh is i' + (p - kh + ph)/2; offsets are
            # consecutive descending, so after the flip tap j sits at
            # offset j + (offs[0] - n + 1) -> pad lo = -(offs[0] - n + 1).
            off0_h = (p - khs[0] + ph) // 2
            off0_w = (p - kws[0] + pw) // 2
            nkh, nkw = len(khs), len(kws)
            lo_h = -(off0_h - nkh + 1)
            lo_w = -(off0_w - nkw + 1)
            row.append(
                jax.lax.conv_general_dilated(
                    dy, kio, (1, 1),
                    [(lo_h, nkh - 1 - lo_h), (lo_w, nkw - 1 - lo_w)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=cin,
                )
            )
        parts.append(row)
    top = jnp.stack([parts[0][0], parts[0][1]], axis=3)
    bot = jnp.stack([parts[1][0], parts[1][1]], axis=3)
    full = jnp.stack([top, bot], axis=2)  # (B, h/2, 2, w/2, 2, Cin)
    return full.reshape(dy.shape[0], h, w, cin)


@jax.custom_vjp
def _dw_s2_conv_frozen(x: Array, kernel: Array) -> Array:
    """Stride-2 SAME depthwise(-multiplier) conv: XLA forward, parity-
    decomposed dx, ZERO kernel cotangent (frozen-backbone contract)."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(2, 2),
        padding=[(kernel.shape[0] // 2, kernel.shape[0] // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _dw_s2_fwd(x, kernel):
    return _dw_s2_conv_frozen(x, kernel), (kernel, x.shape)


def _dw_s2_bwd(res, dy):
    kernel, xshape = res
    dx = _parity_bwd_dx(dy, kernel, xshape[-1], xshape[1], xshape[2])
    return dx.astype(dy.dtype), jnp.zeros_like(kernel)


_dw_s2_conv_frozen.defvjp(_dw_s2_fwd, _dw_s2_bwd)


def dw_branch_conv(x: Array, kernel: Array, strides, groups) -> Array:
    """One branch conv with measured-fast routing.

    - stride-1 multiplier-1 depthwise at C < 128: optionally the
      lane-packed Pallas kernel (ops/dwconv.py; opt-in — the round-5 A/B
      measured solo dispatch as an end-to-end regression).
    - stride-2 depthwise(-multiplier): XLA forward + the parity-decomposed
      backward (:func:`_parity_bwd_dx`), replacing XLA's degenerate
      transposed-conv lowering. Zero kernel cotangent — valid because
      every FastViT backbone conv is frozen in every training mode
      (train/partition.py)."""
    from dino_pose_tpu.ops import dwconv as DW

    bk = kernel.shape[0]
    b_, hh, ww, in_ch = x.shape
    if (
        strides == (1, 1)
        and kernel.shape[2] == 1
        and groups == in_ch == kernel.shape[-1]
        and DW.dwconv_enabled(in_ch, hh, ww, bk, x.dtype.itemsize, batch=b_)
    ):
        return DW.dispatch_dw_conv(x, kernel)
    if (
        strides == (2, 2)
        and kernel.shape[2] == 1
        and groups == in_ch
        and hh % 2 == 0
        and ww % 2 == 0
        and os.environ.get("DINO_POSE_TPU_DS_BWD", "1") != "0"
    ):
        return _dw_s2_conv_frozen(x, kernel)
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=strides,
        padding=[(bk // 2, bk // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def stats_branch_reuse(
    x: Array,
    kernel: Array,
    bn: BNAffine,
    *,
    strides: tuple[int, int],
    groups: int,
) -> tuple[Array, Array, Array]:
    """Train-mode (conv, BN) branch with its output reused.

    Runs the branch conv ONCE, feeds its batch statistics through the BN
    affine, and returns ``(y, inv, shift)`` so the caller accumulates
    ``inv * y + shift`` elementwise instead of re-convolving x with a
    folded kernel (:func:`reuse_enabled`)."""
    y = dw_branch_conv(x, kernel, strides, groups)
    mean, var, n = branch_stats(y)
    inv, shift = bn(mean, var, n, train=True)
    return y, inv, shift


def apply_folded(
    x: Array,
    kernel_f32: Array,
    bias_f32: Array,
    *,
    strides: tuple[int, int],
    padding: tuple[int, int],
    feature_group_count: int = 1,
) -> Array:
    """One conv with the folded kernel; compute dtype follows x."""
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x,
        kernel_f32.astype(x.dtype),
        window_strides=strides,
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    return y + bias_f32.astype(y.dtype)
