"""Training losses (reference formulas, /root/reference/train.py:89-120).

- Heatmap loss: MSE masked to visible keypoints (COCO visibility == 2), with a
  self-weighting factor ``exp(-diff^2)`` on the *detached* squared error that
  down-weights already-large errors (focal-style), then a mean over **all**
  elements (masked ones contribute zero but stay in the denominator).
- Z loss: L1 between visibility-masked predictions and targets, mean over all
  (B, K) entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def keypoint_loss(pred_heatmaps: Array, target_heatmaps: Array, confidence: Array) -> Array:
    """pred/target: (B, K, H, W); confidence: (B, K) COCO visibility flags."""
    mask = (confidence > 1).astype(jnp.float32)[..., None, None]
    diff = jnp.square(
        pred_heatmaps.astype(jnp.float32) - target_heatmaps.astype(jnp.float32)
    )
    weight = jnp.exp(-jax.lax.stop_gradient(diff))
    return jnp.mean(weight * diff * mask)


def z_loss(pred_z: Array, target_z: Array, confidence: Array) -> Array:
    """pred/target: (B, K); confidence: (B, K) COCO visibility flags."""
    mask = (confidence > 1).astype(jnp.float32)
    return jnp.mean(jnp.abs(pred_z.astype(jnp.float32) * mask - target_z.astype(jnp.float32) * mask))
