"""Flax linen layers with exact PyTorch numerical semantics.

These exist so (a) checkpoints bridge losslessly to/from the reference's torch
state dicts and (b) training dynamics (initialisation, batch-norm running
statistics) match the reference formulas. Layout is TPU-native:

- activations: NHWC
- Dense kernels: (in, out)
- Conv kernels: HWIO  (kh, kw, in/groups, out)
- ConvTranspose kernels: HWIO of the *equivalent dilated conv* — i.e. already
  spatially flipped and in/out transposed relative to torch's
  ``(in, out, kh, kw)``; the bridge performs that relayout once at
  import/export.

Reference behaviours mirrored here:
- torch Linear/Conv default init: kaiming-uniform(a=sqrt(5)) -> U(±1/sqrt(fan_in)).
- torch BatchNorm2d: biased variance for normalisation, *unbiased* variance in
  the running estimate, momentum 0.1, eps 1e-5.
- torch ``F.interpolate`` bicubic/bilinear (align_corners=False, A=-0.75) as
  precomputed separable resize matrices (static shapes, MXU-friendly).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Initializers (torch parity)
# ---------------------------------------------------------------------------

def torch_kaiming_uniform(fan_in_fn: Callable[[Sequence[int]], int]):
    """torch's default weight init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = max(1, fan_in_fn(shape))
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_bound(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dense_fan_in(shape):  # kernel (in, out)
    return shape[0]


def _conv_fan_in(shape):  # kernel (kh, kw, in/groups, out)
    return shape[0] * shape[1] * shape[2]


def _convt_fan_in(shape):  # kernel (kh, kw, in, out): torch fan_in = out*kh*kw
    return shape[0] * shape[1] * shape[3]


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


class Dense(nn.Module):
    """Linear layer, torch-default initialised. Kernel layout (in, out)."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kaiming_uniform(_dense_fan_in), (in_features, self.features)
        )
        # Same-dtype operands, no preferred_element_type: the MXU still
        # accumulates bf16 contractions in float32 internally, and a float32
        # preferred type makes the VJP emit mixed-dtype convs/dots (bf16
        # residual x float32 cotangent), which lax rejects.
        y = jnp.dot(
            x.astype(self.dtype) if self.dtype else x,
            kernel.astype(x.dtype if self.dtype is None else self.dtype),
        )
        if self.use_bias:
            bias = self.param(
                "bias", uniform_bound(1.0 / math.sqrt(max(1, in_features))), (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y.astype(x.dtype)


class Conv(nn.Module):
    """2-D convolution, NHWC, torch Conv2d semantics (zero padding, groups)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    feature_group_count: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        in_features = x.shape[-1]
        kernel_shape = (kh, kw, in_features // self.feature_group_count, self.features)
        kernel = self.param("kernel", torch_kaiming_uniform(_conv_fan_in), kernel_shape)
        pad = [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])]
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=self.strides,
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            fan_in = max(1, kernel_shape[0] * kernel_shape[1] * kernel_shape[2])
            bias = self.param("bias", uniform_bound(1.0 / math.sqrt(fan_in)), (self.features,))
            y = y + bias.astype(y.dtype)
        return y.astype(x.dtype)


class ConvTranspose(nn.Module):
    """Transposed 2-D convolution with torch ConvTranspose2d geometry.

    out = (in - 1) * stride - 2 * padding + kernel.

    Implemented as the equivalent input-dilated convolution:
    ``conv(dilate(x, stride), K, pad=k-1-p)`` where the stored kernel ``K`` is
    the spatially-flipped, in/out-transposed torch weight (relayout done by the
    checkpoint bridge).
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    output_padding: tuple[int, int] = (0, 0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kaiming_uniform(_convt_fan_in), (kh, kw, in_features, self.features)
        )
        # torch's output_padding extends the bottom/right edge only.
        pad = [
            (kh - 1 - self.padding[0], kh - 1 - self.padding[0] + self.output_padding[0]),
            (kw - 1 - self.padding[1], kw - 1 - self.padding[1] + self.output_padding[1]),
        ]
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = max(1, kh * kw * self.features)
            bias = self.param("bias", uniform_bound(1.0 / math.sqrt(fan_in)), (self.features,))
            y = y + bias.astype(y.dtype)
        return y.astype(x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm with torch running-statistics semantics.

    Normalisation uses biased batch variance; the running-variance estimate is
    updated with the *unbiased* variance (matching torch BatchNorm2d). Running
    stats live in the ``batch_stats`` collection. Under a sharded batch the
    reductions are global (XLA inserts the cross-replica collectives), giving
    synchronised batch-norm across the data axis for free.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool | None = None) -> Array:
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            # Two-pass (shifted) variance, torch semantics: the one-pass
            # E[x^2] - E[x]^2 form cancels catastrophically in f32 for
            # large-mean activations (can even go negative -> rsqrt NaN).
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            n = x.size // features
            unbiased = var * (n / max(1, n - 1))
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with float32 statistics and *input-dtype* output.

    flax's ``nn.LayerNorm`` with float32 params promotes bfloat16 activations
    to float32 — which silently switches every downstream matmul off the
    bf16 MXU path (measured: the whole ViT backbone ran at f32 rate).
    This variant normalises in float32 (torch semantics) and casts back.
    """

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        # Measured end-to-end on v5e: the Pallas fused-LN kernel
        # (ops/layernorm.py, opt-in via DINO_POSE_TPU_LN=pallas) is *slower*
        # here (47.4 vs 44.3 ms/step) — a custom call blocks XLA from fusing
        # the norm with the adjacent residual/LayerScale elementwise ops.
        import os

        if os.environ.get("DINO_POSE_TPU_LN", "").lower() == "pallas":
            from dino_pose_tpu.ops.layernorm import fused_layernorm

            return fused_layernorm(x, scale, bias, self.epsilon)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


Dropout = nn.Dropout


# ---------------------------------------------------------------------------
# Static resize operators (torch F.interpolate parity)
# ---------------------------------------------------------------------------

def _torch_src_coord(i: np.ndarray, scale: float) -> np.ndarray:
    # align_corners=False source coordinate.
    return (i + 0.5) * scale - 0.5


def cubic_resize_matrix(in_size: int, out_size: int, a: float = -0.75) -> np.ndarray:
    """(out, in) matrix applying torch's bicubic (align_corners=False) resample.

    Cubic convolution kernel with A=-0.75 (torch/OpenCV convention), border
    taps clamped. Because resize is linear, applying this matrix along H and W
    reproduces ``F.interpolate(mode='bicubic')`` exactly — and turns the
    interpolation into two small matmuls the MXU eats for free.
    """
    scale = in_size / out_size
    x = _torch_src_coord(np.arange(out_size, dtype=np.float64), scale)
    x0 = np.floor(x).astype(np.int64)
    t = x - x0
    m = np.zeros((out_size, in_size), dtype=np.float64)

    def cubic(d):
        d = abs(d)
        if d <= 1:
            return (a + 2) * d**3 - (a + 3) * d**2 + 1
        if d < 2:
            return a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a
        return 0.0

    for i in range(out_size):
        for tap in range(-1, 3):
            idx = int(np.clip(x0[i] + tap, 0, in_size - 1))
            m[i, idx] += cubic(tap - t[i])
    return m.astype(np.float32)


def linear_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix applying torch's bilinear (align_corners=False) resample."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    x = np.clip(_torch_src_coord(np.arange(out_size, dtype=np.float64), scale), 0, in_size - 1)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, in_size - 1)
    x1 = np.clip(x0 + 1, 0, in_size - 1)
    t = x - x0
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        m[i, x0[i]] += 1 - t[i]
        m[i, x1[i]] += t[i]
    return m.astype(np.float32)


def nearest_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix applying torch's 'nearest' resample (floor indexing)."""
    scale = in_size / out_size
    idx = np.minimum((np.arange(out_size) * scale).astype(np.int64), in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), idx] = 1.0
    return m


def bilinear_resize(x: Array, out_hw: tuple[int, int]) -> Array:
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` on NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(linear_resize_matrix(h, out_hw[0]), x.dtype)
    mw = jnp.asarray(linear_resize_matrix(w, out_hw[1]), x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", mh, x)
    return jnp.einsum("pw,...owc->...opc", mw, y)
