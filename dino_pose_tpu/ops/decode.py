"""Keypoint decoding from heatmaps — fused on device.

The reference decodes on the host with numpy, one keypoint at a time
(``weighted_max_loc``, /root/reference/src/model_utils.py:10-51): argmax, then
an intensity-weighted centroid over the 5x5 window around it (half-pixel
centres), scaled to the target image size. Here the same math runs as one
vectorised XLA program over the whole (B, K) batch — masks from iota instead of
window crops, so there is no data-dependent slicing and everything fuses.

Boundary behaviour is identical: clamping the 5x5 crop at the image edge is
exactly the ``|i - c| <= 2`` mask.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array

_WINDOW = 2  # reference `padding = 2` -> 5x5 window

# DINO_POSE_TPU_DECODE_GUARD=1 replaces the reference's NaN-on-all-zero-window
# decode with the argmax cell centre (see comment at the division below).
_GUARD_ZERO_WINDOW = os.environ.get("DINO_POSE_TPU_DECODE_GUARD", "0") == "1"


def decode_heatmaps(
    heatmaps: Array, target_size: tuple[int, int] = (224, 224)
) -> Array:
    """(B, K, H, W) heatmaps -> (B, K, 2) keypoints in target (x, y) pixels."""
    b, k, h, w = heatmaps.shape
    hm = heatmaps.astype(jnp.float32)
    flat_idx = jnp.argmax(hm.reshape(b, k, h * w), axis=-1)
    cy = flat_idx // w
    cx = flat_idx % w

    rows = jax.lax.broadcasted_iota(jnp.int32, (b, k, h, w), 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, k, h, w), 3)
    mask = (jnp.abs(rows - cy[..., None, None]) <= _WINDOW) & (
        jnp.abs(cols - cx[..., None, None]) <= _WINDOW
    )
    win = jnp.where(mask, hm, 0.0)
    total = jnp.sum(win, axis=(-2, -1))
    # A window summing to exactly 0 (all-zero channel, e.g. an untrained
    # model) divides 0/0 — NaN coordinates, matching the reference's numpy
    # division (/root/reference/src/model_utils.py:44-47) bug-for-bug; PCKh
    # absorbs the NaNs as misses. Guarded to the argmax cell centre when the
    # flag is set, purely as an eval-debugging aid.
    if _GUARD_ZERO_WINDOW:
        safe = total > 0.0
        denom = jnp.where(safe, total, 1.0)
        loc_x = jnp.where(
            safe,
            jnp.sum((cols.astype(jnp.float32) + 0.5) * win, axis=(-2, -1)) / denom,
            cx.astype(jnp.float32) + 0.5,
        )
        loc_y = jnp.where(
            safe,
            jnp.sum((rows.astype(jnp.float32) + 0.5) * win, axis=(-2, -1)) / denom,
            cy.astype(jnp.float32) + 0.5,
        )
    else:
        loc_x = jnp.sum((cols.astype(jnp.float32) + 0.5) * win, axis=(-2, -1)) / total
        loc_y = jnp.sum((rows.astype(jnp.float32) + 0.5) * win, axis=(-2, -1)) / total

    tw, th = target_size
    return jnp.stack([loc_x / w * tw, loc_y / h * th], axis=-1)


def heatmap_confidences(heatmaps: Array) -> Array:
    """Peak value per keypoint channel: (B, K, H, W) -> (B, K)."""
    return jnp.max(heatmaps, axis=(-2, -1))
