"""Pose prediction heads: per-keypoint 48x48 heatmaps + scalar z coordinates.

Topology-compatible with the reference heads so checkpoints bridge losslessly:

- :class:`SpatialAwarePoseHeads` — the head family both pose models actually
  use (/root/reference/model/pose_heads.py:211-400): conv refine -> hourglass
  (depthwise + 2x down / bottleneck / 2x up + skip) -> transposed-conv
  upsampling to >= target -> 3x3+1x1 prediction -> bilinear resize to the exact
  heatmap size; z head is an MLP over the spatially mean-pooled feature map.
- :class:`PoseHeads` (MLP variant) — defined by the reference
  (/root/reference/model/pose_heads.py:6-208) but unused by its models; kept
  for API completeness.

All convolutions run NHWC. The bilinear resize is a pair of static matmuls
(MXU) rather than a gather resample.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dino_pose_tpu.nn import layers as L

Array = jax.Array


class ConvBNRelu(nn.Module):
    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (1, 1)
    groups: int = 1

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        x = L.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            name="conv",
        )(x)
        x = L.BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class DeconvBNRelu(nn.Module):
    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int]
    padding: tuple[int, int] = (0, 0)
    output_padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        x = L.ConvTranspose(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            output_padding=self.output_padding,
            name="deconv",
        )(x)
        x = L.BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class HourglassModule(nn.Module):
    """Three-path hourglass: depthwise-separable + down/up pyramid + 1x1 skip.

    Reference topology at /root/reference/model/pose_heads.py:211-285; the three
    paths are summed.
    """

    out_channels: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        c = self.out_channels
        in_c = x.shape[-1]
        if x.shape[1] % 4 or x.shape[2] % 4:
            # Same constraint as the reference (two stride-2 downs + two 2x
            # deconv ups can't reproduce sizes not divisible by 4: 22 -> 11
            # -> 6 -> 12 -> 24 != 22). dinov2 at 224 gives a 16x16 grid;
            # 308/322/518 give 22/23/37 grids and fail in torch too —
            # surface it clearly instead of an XLA broadcast error.
            raise ValueError(
                f"HourglassModule needs a spatial grid divisible by 4, got "
                f"{x.shape[1]}x{x.shape[2]} (input_size/patch_size must be "
                f"divisible by 4; reference pose_heads.py:211-285 has the "
                f"same limit)"
            )

        skip = ConvBNRelu(c, kernel_size=(1, 1), padding=(0, 0), name="skip")(x, train=train)

        dw = ConvBNRelu(in_c, groups=in_c, name="dw")(x, train=train)
        dw = ConvBNRelu(c, kernel_size=(1, 1), padding=(0, 0), name="pw")(dw, train=train)

        d1 = ConvBNRelu(c // 2, strides=(2, 2), name="down1")(x, train=train)
        d2 = ConvBNRelu(c // 4, strides=(2, 2), name="down2")(d1, train=train)

        b = ConvBNRelu(c // 4, name="btl1")(d2, train=train)
        b = L.Conv(c // 4, kernel_size=(3, 3), padding=(1, 1), name="btl2_conv")(b)
        b = L.BatchNorm(name="btl2_bn")(b, use_running_average=not train)
        b = nn.relu(b + d2)

        u1 = DeconvBNRelu(c // 2, kernel_size=(2, 2), strides=(2, 2), name="up1")(b, train=train)
        u2 = DeconvBNRelu(c, kernel_size=(2, 2), strides=(2, 2), name="up2")(u1, train=train)

        return u2 + skip + dw


def adaptive_avg_pool(x, target: int):
    """torch ``AdaptiveAvgPool2d(target)`` on NHWC via two static averaging
    matrices (windows [floor(i*s/t), ceil((i+1)*s/t)) — exact semantics),
    i.e. two small matmuls instead of a gather."""
    s = x.shape[1]
    m = np.zeros((target, s), np.float32)
    for i in range(target):
        lo, hi = (i * s) // target, -(-((i + 1) * s) // target)
        m[i, lo:hi] = 1.0 / (hi - lo)
    mj = jnp.asarray(m, x.dtype)
    x = jnp.einsum("ts,bshc->bthc", mj, x)
    return jnp.einsum("ts,bhsc->bhtc", mj, x)


def upsampling_plan(spatial_input_size: int, heatmap_size: int) -> list[tuple[int, int]]:
    """Replicates the reference's stage loop: list of (out_channels, stride).

    (/root/reference/model/pose_heads.py:316-331 — note the tracker doubles per
    stage regardless of the actual transposed-conv output size.)
    """
    plan = []
    current, in_ch = spatial_input_size, 256
    while current < heatmap_size:
        out_ch = max(128, in_ch // 2)
        stride = heatmap_size // current
        plan.append((out_ch, stride))
        current *= 2
        in_ch = out_ch
    return plan


class SpatialAwareHeatmapHead(nn.Module):
    num_keypoints: int = 24
    heatmap_size: int = 48
    spatial_input_size: int = 16

    @nn.compact
    def __call__(self, fmap: Array, *, train: bool) -> Array:
        x = ConvBNRelu(512, name="refine_in")(fmap, train=train)
        x = HourglassModule(512, name="hourglass")(x, train=train)
        x = ConvBNRelu(256, name="refine_out")(x, train=train)

        tracker = self.spatial_input_size
        for j, (out_ch, stride) in enumerate(
            upsampling_plan(self.spatial_input_size, self.heatmap_size)
        ):
            x = DeconvBNRelu(
                out_ch,
                kernel_size=(4, 4),
                strides=(stride, stride),
                padding=(1, 1),
                name=f"up{j}",
            )(x, train=train)
            tracker *= 2

        x = ConvBNRelu(64, name="pred_conv")(x, train=train)
        x = L.Conv(self.num_keypoints, kernel_size=(1, 1), padding=(0, 0), name="pred_out")(x)

        # Bug-for-bug: the reference gates interpolation on its DOUBLING
        # TRACKER, not the actual tensor size (pose_heads.py:316-345) — a
        # tracker that lands exactly on heatmap_size skips the resize even
        # when the real output is bigger.
        if tracker != self.heatmap_size:
            x = L.bilinear_resize(x, (self.heatmap_size, self.heatmap_size))
        return x  # NHWC: (B, heatmap, heatmap, K)


class ZCoordinateHead(nn.Module):
    num_keypoints: int = 24
    hidden_dims: Sequence[int] = (1024, 512)
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, feats: Array, *, train: bool) -> Array:
        x = feats
        for j, h in enumerate(self.hidden_dims):
            x = L.Dense(h, name=f"fc{j}")(x)
            x = nn.relu(x)
            x = L.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
        return L.Dense(self.num_keypoints, name="out")(x)


class SpatialAwarePoseHeads(nn.Module):
    """Heatmaps from the spatial map + z from its global average pool."""

    num_keypoints: int = 24
    heatmap_size: int = 48
    spatial_input_size: int = 16
    z_hidden_dims: Sequence[int] = (1024, 512, 256)
    z_dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, fmap: Array, *, train: bool) -> tuple[Array, Array]:
        heatmaps = SpatialAwareHeatmapHead(
            num_keypoints=self.num_keypoints,
            heatmap_size=self.heatmap_size,
            spatial_input_size=self.spatial_input_size,
            name="heatmap_head",
        )(fmap, train=train)
        pooled = jnp.mean(fmap, axis=(1, 2))
        z = ZCoordinateHead(
            num_keypoints=self.num_keypoints,
            hidden_dims=tuple(self.z_hidden_dims),
            dropout_rate=self.z_dropout_rate,
            name="z_head",
        )(pooled, train=train)
        return heatmaps, z


# ---------------------------------------------------------------------------
# MLP-variant heads (reference defines them; models don't use them)
# ---------------------------------------------------------------------------


class HeatmapHead(nn.Module):
    """Vector-input heatmap head: MLP projection to a 6x6 map + deconv chain."""

    num_keypoints: int = 24
    heatmap_size: int = 48
    intermediate_features: int = 512
    spatial_size: int = 6

    @nn.compact
    def __call__(self, feats: Array, *, train: bool) -> Array:
        s, c = self.spatial_size, self.intermediate_features
        x = L.Dense(2048, name="proj0")(feats)
        x = L.Dropout(rate=0.1)(nn.relu(x), deterministic=not train)
        x = L.Dense(1024, name="proj1")(x)
        x = L.Dropout(rate=0.1)(nn.relu(x), deterministic=not train)
        x = nn.relu(L.Dense(s * s * c, name="proj2")(x))
        # torch reshapes to NCHW (B, C, s, s); mirror then go channels-last.
        x = x.reshape(x.shape[0], c, s, s).transpose(0, 2, 3, 1)

        channels = [256]
        current = s * 2
        in_ch = 256
        out_ch = 128
        while current < self.heatmap_size:
            channels.append(out_ch)
            current *= 2
            in_ch, out_ch = out_ch, max(64, out_ch // 2)
        for j, ch in enumerate(channels):
            x = DeconvBNRelu(
                ch,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding=(1, 1),
                output_padding=(1, 1),
                name=f"up{j}",
            )(x, train=train)
        if current > self.heatmap_size:
            # Overshot: conv to 64 then AdaptiveAvgPool2d(target) exactly
            # like the reference (pose_heads.py:86-96).
            x = ConvBNRelu(64, name="adjust")(x, train=train)
            x = adaptive_avg_pool(x, self.heatmap_size)
        elif x.shape[-1] != 64:
            x = ConvBNRelu(64, name="adjust")(x, train=train)
        return L.Conv(self.num_keypoints, kernel_size=(1, 1), padding=(0, 0), name="pred")(x)


class PoseHeads(nn.Module):
    """MLP-variant combined heads (vector features in, heatmaps + z out)."""

    num_keypoints: int = 24
    heatmap_size: int = 48

    @nn.compact
    def __call__(self, feats: Array, *, train: bool) -> tuple[Array, Array]:
        hm = HeatmapHead(
            num_keypoints=self.num_keypoints,
            heatmap_size=self.heatmap_size,
            name="heatmap_head",
        )(feats, train=train)
        z = ZCoordinateHead(num_keypoints=self.num_keypoints, name="z_head")(
            feats, train=train
        )
        return hm, z
