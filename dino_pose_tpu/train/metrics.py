"""PCKh evaluation metrics, fully vectorised on device.

Reference protocol (/root/reference/src/model_utils.py:53-158):

- 2-D PCKh@r: threshold = ||TOP - NECK||_2 * r, falling back to the
  RIGHT_HIP/LEFT_HIP pair when the head isn't visible; an image with neither
  pair visible scores 0. Only visible keypoints (v != 0) are counted.
- z-PCKh@r: predictions are un-normalised back to annotation space; the
  threshold is r times the 3-D TOP-NECK distance (fallback: population std of
  the non-zero target z values); all K keypoints are counted (the reference
  does not mask visibility here — reproduced).

The reference evaluates serially per image on the host; here the same math is
a vmapped device program used both for dataset eval and in-training metrics.
Additionally PCK@r (threshold = r * bbox diagonal of visible keypoints) is
provided for the BASELINE.json "PCK@0.2" protocol.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dino_pose_tpu.constants import KeyPoints
from dino_pose_tpu.data.keypoints import denormalize_z

Array = jax.Array


def _pckh_single(pred: Array, target: Array, threshold_ratio: float) -> Array:
    """pred (K, 2), target (K, 3) -> scalar in [0, 1]."""
    top = target[KeyPoints.TOP]
    neck = target[KeyPoints.NECK]
    head_ok = (top[2] != 0) & (neck[2] != 0)
    rhip = target[KeyPoints.RIGHT_HIP]
    lhip = target[KeyPoints.LEFT_HIP]
    hip_ok = (rhip[2] != 0) & (lhip[2] != 0)

    a = jnp.where(head_ok, top[:2], rhip[:2])
    b = jnp.where(head_ok, neck[:2], lhip[:2])
    thresh = jnp.sqrt(jnp.sum(jnp.square(a - b))) * threshold_ratio

    vis = target[:, 2] != 0
    dist = jnp.sqrt(jnp.sum(jnp.square(pred - target[:, :2]), axis=-1))
    correct = jnp.sum((dist < thresh) & vis)
    total = jnp.sum(vis)
    score = jnp.where(total > 0, correct / jnp.maximum(total, 1), 0.0)
    return jnp.where(head_ok | hip_ok, score, 0.0)


def pckh_2d(pred: Array, target: Array, threshold_ratio: float = 0.5) -> Array:
    """Batched 2-D PCKh. pred (B, K, 2), target (B, K, 3) -> (B,)."""
    return jax.vmap(lambda p, t: _pckh_single(p, t, threshold_ratio))(
        pred.astype(jnp.float32), target.astype(jnp.float32)
    )


def _masked_population_std(x: Array, mask: Array) -> Array:
    n = jnp.sum(mask)
    mean = jnp.sum(x * mask) / jnp.maximum(n, 1)
    var = jnp.sum(jnp.square(x - mean) * mask) / jnp.maximum(n, 1)
    return jnp.sqrt(var)


def _pckh_z_single(pred_z: Array, target_z: Array, target_kps: Array, threshold: float) -> Array:
    """pred_z (K,), target_z (K,) annotation space, target_kps (K, 3)."""
    pred_ann = denormalize_z(pred_z[None], target_z[None], target_kps[None])[0]
    top = target_kps[KeyPoints.TOP]
    neck = target_kps[KeyPoints.NECK]
    head_ok = (top[2] > 0) & (neck[2] > 0)
    d3 = jnp.sqrt(
        jnp.square(top[0] - neck[0])
        + jnp.square(top[1] - neck[1])
        + jnp.square(target_z[KeyPoints.TOP] - target_z[KeyPoints.NECK])
    )
    fallback = _masked_population_std(target_z, (target_z != 0).astype(jnp.float32))
    ref_dist = jnp.where(head_ok, d3, fallback)
    correct = jnp.abs(pred_ann - target_z) < threshold * ref_dist
    return jnp.mean(correct.astype(jnp.float32))


def pckh_z(pred_z: Array, target_z: Array, target_kps: Array, threshold: float = 0.5) -> Array:
    """Batched z-PCKh. pred_z/target_z (B, K), target_kps (B, K, 3) -> (B,)."""
    return jax.vmap(lambda p, t, k: _pckh_z_single(p, t, k, threshold))(
        pred_z.astype(jnp.float32),
        target_z.astype(jnp.float32),
        target_kps.astype(jnp.float32),
    )


def pck_bbox(pred: Array, target: Array, threshold_ratio: float = 0.2) -> Array:
    """PCK@r with a bbox-diagonal threshold over visible keypoints: (B,)."""

    def single(p, t):
        vis = t[:, 2] != 0
        big = jnp.where(vis[:, None], t[:, :2], -jnp.inf)
        small = jnp.where(vis[:, None], t[:, :2], jnp.inf)
        extent = jnp.max(big, axis=0) - jnp.min(small, axis=0)
        diag = jnp.sqrt(jnp.sum(jnp.square(extent)))
        dist = jnp.sqrt(jnp.sum(jnp.square(p - t[:, :2]), axis=-1))
        correct = jnp.sum((dist < threshold_ratio * diag) & vis)
        total = jnp.sum(vis)
        return jnp.where(total > 0, correct / jnp.maximum(total, 1), 0.0)

    return jax.vmap(single)(pred.astype(jnp.float32), target.astype(jnp.float32))
