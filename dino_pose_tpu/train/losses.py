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
import numpy as np

Array = jax.Array


def keypoint_loss(
    pred_heatmaps: Array,
    target_heatmaps: Array,
    confidence: Array,
    sample_valid: Array | None = None,
) -> Array:
    """pred/target: (B, K, H, W); confidence: (B, K) COCO visibility flags.

    ``sample_valid`` is an optional (B,) 0/1 mask marking real (vs padded)
    samples: padded samples contribute zero and are excluded from the mean's
    denominator, so a zero-padded tail batch reports the same loss as an
    unpadded one.
    """
    mask = (confidence > 1).astype(jnp.float32)[..., None, None]
    diff = jnp.square(
        pred_heatmaps.astype(jnp.float32) - target_heatmaps.astype(jnp.float32)
    )
    weight = jnp.exp(-jax.lax.stop_gradient(diff))
    if sample_valid is None:
        return jnp.mean(weight * diff * mask)
    sv = sample_valid.astype(jnp.float32)
    per_elem = weight * diff * mask * sv[:, None, None, None]
    denom = jnp.maximum(jnp.sum(sv), 1.0) * np.prod(pred_heatmaps.shape[1:])
    return jnp.sum(per_elem) / denom


def z_loss(
    pred_z: Array,
    target_z: Array,
    confidence: Array,
    sample_valid: Array | None = None,
) -> Array:
    """pred/target: (B, K); confidence: (B, K) COCO visibility flags."""
    mask = (confidence > 1).astype(jnp.float32)
    abs_err = jnp.abs(
        pred_z.astype(jnp.float32) * mask - target_z.astype(jnp.float32) * mask
    )
    if sample_valid is None:
        return jnp.mean(abs_err)
    sv = sample_valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(sv), 1.0) * pred_z.shape[-1]
    return jnp.sum(abs_err * sv[:, None]) / denom
