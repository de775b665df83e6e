"""Keypoint/z-coordinate normalisation math.

Reference formulas: z relative to a fixed-anthropometric centre of mass,
scaled by the mean of the x/y standard deviations of the (visibility-masked)
2-D keypoints (/root/reference/data_loader/data_loader.py:101-119); inverse at
/root/reference/src/model_utils.py:107-128. Note the reference computes the
std over *all* 24 values with invisible entries zeroed (not over the visible
subset) — reproduced here deliberately.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dino_pose_tpu.constants import COM_WEIGHTS

Array = jax.Array

_EPS32 = float(jnp.finfo(jnp.float32).eps)


def z_scale(keypoints: Array) -> Array:
    """Scale used for z normalisation. keypoints: (..., K, 3)."""
    vis = (keypoints[..., 2] != 0).astype(jnp.float32)
    x = keypoints[..., 0] * vis
    y = keypoints[..., 1] * vis
    scale = (jnp.std(x, axis=-1) + jnp.std(y, axis=-1)) / 2
    return jnp.where(scale == 0, _EPS32, scale)


def normalize_z(keypoints: Array, z3d: Array) -> Array:
    """Annotation-space z -> normalised z. keypoints (..., K, 3), z3d (..., K)."""
    com_w = jnp.asarray(COM_WEIGHTS, jnp.float32)
    z = z3d - jnp.sum(z3d * com_w, axis=-1, keepdims=True)
    return z / z_scale(keypoints)[..., None]


def denormalize_z(pred_z: Array, target_z3d: Array, target_keypoints: Array) -> Array:
    """Predicted normalised z -> annotation space (uses target geometry)."""
    com_w = jnp.asarray(COM_WEIGHTS, jnp.float32)
    com = jnp.sum(target_z3d * com_w, axis=-1, keepdims=True)
    return pred_z * z_scale(target_keypoints)[..., None] + com


def normalize_z_np(keypoints: "np.ndarray", z3d: "np.ndarray") -> "np.ndarray":
    """numpy twin of :func:`normalize_z` for the host input pipeline: a jit
    dispatch + device round-trip per 24-float sample (one per loader thread
    per record) costs far more than the math itself. Formula-identical,
    including the zeroed-entry std quirk."""
    kp = np.asarray(keypoints, np.float32)
    z3 = np.asarray(z3d, np.float32)
    vis = (kp[..., 2] != 0).astype(np.float32)
    x = kp[..., 0] * vis
    y = kp[..., 1] * vis
    scale = (x.std(axis=-1) + y.std(axis=-1)) / 2.0
    scale = np.where(scale == 0, _EPS32, scale).astype(np.float32)
    com_w = np.asarray(COM_WEIGHTS, np.float32)
    z = z3 - np.sum(z3 * com_w, axis=-1, keepdims=True)
    return (z / scale[..., None]).astype(np.float32)
