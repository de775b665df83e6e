"""Gaussian heatmap target synthesis — separable, batched, device-native.

Reference semantics (/root/reference/data_loader/data_loader.py:61-99): for
each visible keypoint, splat ``exp(-d^2 / 2 sigma^2)`` (sigma = 15.0) onto a
full-resolution canvas inside a square window of half-width
``delta * sigma`` (delta = sqrt(2 * 1.6052)), window corners truncated with
``int()``, then ``cv2.resize(..., INTER_CUBIC)`` down to the target heatmap
size. Keypoints with x < 0, y < 0 or v == 0 produce an all-zero channel.

TPU-first reformulation: both the windowed Gaussian (a product of two 1-D
windowed Gaussians) and the bicubic resize (two independent 1-D filters) are
separable, so the whole per-channel render is

    heatmap[k] = (R_y @ g_y[k]) (R_x @ g_x[k])^T

with ``R_y/R_x`` constant (heatmap_size x image_size) resize matrices that
reproduce OpenCV's INTER_CUBIC taps (Catmull-Rom a = -0.75, half-pixel
centres, replicated borders). No full-resolution canvas is ever materialised:
per sample the work drops from O(K*H*W) splat + resize to
O(K*(H + W)*heatmap_size), and the whole batch renders on device inside the
jitted step (no host round-trip, no cv2).

``render_heatmaps_host`` is the float64 numpy twin used for tests and for
variable-size images on the host path; it matches the reference's
splat-then-cv2-resize output to float64 round-off.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

SIGMA = 15.0
TH = 1.6052
DELTA = math.sqrt(TH * 2)

Array = jax.Array


def _cubic_weights(frac: np.ndarray, a: float = -0.75) -> np.ndarray:
    """OpenCV bicubic tap weights for fractional offsets (taps at -1..2).

    Evaluated in float32 like cv2's interpolateCubic (coefficients for
    |t| <= 1 and 1 < |t| < 2).
    """
    frac = frac.astype(np.float32)
    a = np.float32(a)
    one, two, three, five, eight = (np.float32(c) for c in (1, 2, 3, 5, 8))
    t0 = one + frac  # distance to tap at floor(x) - 1
    t1 = frac        # tap at floor(x)
    t2 = one - frac  # tap at floor(x) + 1
    t3 = two - frac  # tap at floor(x) + 2

    def near(t):  # |t| <= 1
        return ((a + two) * t - (a + three)) * t * t + one

    def far(t):  # 1 < |t| < 2
        return ((a * t - five * a) * t + eight * a) * t - np.float32(4) * a

    return np.stack([far(t0), near(t1), near(t2), far(t3)], axis=-1)


def resize_matrix(src: int, dst: int, dtype=np.float64) -> np.ndarray:
    """(dst, src) matrix M with (M @ v) == cv2.resize(v, INTER_CUBIC) in 1-D.

    Half-pixel centre mapping ``sx = (i + 0.5) * src/dst - 0.5`` with
    border-replicate clamping, identical to OpenCV's float path.
    """
    scale = src / dst
    i = np.arange(dst, dtype=np.float64)
    # OpenCV truncates the source coordinate and the tap weights to float32
    # even on double images; reproduce that so the matrices are tap-exact.
    sx = ((i + 0.5) * scale - 0.5).astype(np.float32)
    x0 = np.floor(sx)
    frac = (sx - x0).astype(np.float32)
    w = _cubic_weights(frac).astype(np.float32).astype(np.float64)  # (dst, 4)
    m = np.zeros((dst, src), np.float64)
    for tap in range(4):
        cols = np.clip(x0.astype(np.int64) + tap - 1, 0, src - 1)
        np.add.at(m, (np.arange(dst), cols), w[:, tap])
    return m.astype(dtype)


def _windowed_gaussians(centers: np.ndarray, size: int, xp):
    """1-D windowed Gaussians: returns ``(gaussians (K, size), lo (K,),
    hi (K,))`` with exp(-(x-c)^2/2s^2) masked to the [lo, hi) window."""
    r = DELTA * SIGMA
    lo = xp.floor(xp.maximum(0.0, centers - r))
    hi = xp.floor(xp.minimum(float(size), centers + r))
    xs = xp.arange(size, dtype=centers.dtype)
    mask = (xs[None, :] >= lo[:, None]) & (xs[None, :] < hi[:, None])
    g = xp.exp(-((xs[None, :] - centers[:, None]) ** 2) / (2.0 * SIGMA**2))
    return g * mask, lo, hi


def render_heatmaps_host(
    keypoints: np.ndarray, image_size: tuple[int, int], heatmap_size: int = 48
) -> np.ndarray:
    """Reference-exact host render. keypoints (K, 3); image_size (W, H).

    Returns (K, heatmap_size, heatmap_size) float32 (CHW like the reference
    after its transpose at data_loader.py:98).
    """
    kps = np.asarray(keypoints, np.float64)
    width, height = int(image_size[0]), int(image_size[1])
    cx, cy, v = kps[:, 0], kps[:, 1], kps[:, 2]

    gx, x_lo, x_hi = _windowed_gaussians(cx, width, np)
    gy, y_lo, y_hi = _windowed_gaussians(cy, height, np)
    valid = (cx >= 0) & (cy >= 0) & (v != 0) & (x_lo < x_hi) & (y_lo < y_hi)

    rx = resize_matrix(width, heatmap_size)
    ry = resize_matrix(height, heatmap_size)
    gxr = gx @ rx.T  # (K, hs)
    gyr = gy @ ry.T
    hm = np.einsum("kh,kw->khw", gyr, gxr) * valid[:, None, None]
    return hm.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "heatmap_size")
)
def render_heatmaps(
    keypoints: Array,
    *,
    height: int = 224,
    width: int = 224,
    heatmap_size: int = 48,
) -> Array:
    """Batched device render: (B, K, 3) keypoints -> (B, K, hs, hs) targets.

    Bitwise semantics of :func:`render_heatmaps_host` in float32; runs inside
    jit so targets are synthesised on-device from the (tiny) keypoint tensor
    instead of shipping (B, K, 48, 48) from the host every step.
    """
    kps = keypoints.astype(jnp.float32)
    rx = jnp.asarray(resize_matrix(width, heatmap_size, np.float32))
    ry = jnp.asarray(resize_matrix(height, heatmap_size, np.float32))

    def single(k):
        cx, cy, v = k[:, 0], k[:, 1], k[:, 2]
        gx, x_lo, x_hi = _windowed_gaussians(cx, width, jnp)
        gy, y_lo, y_hi = _windowed_gaussians(cy, height, jnp)
        valid = (cx >= 0) & (cy >= 0) & (v != 0) & (x_lo < x_hi) & (y_lo < y_hi)
        gxr = gx @ rx.T
        gyr = gy @ ry.T
        return jnp.einsum("kh,kw->khw", gyr, gxr) * valid[:, None, None]

    return jax.vmap(single)(kps)
