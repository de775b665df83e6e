"""Heatmap target synthesis parity.

Oracle: a direct transcription of the reference algorithm
(/root/reference/data_loader/data_loader.py:61-99) — full-resolution numpy
splat followed by real ``cv2.resize(..., INTER_CUBIC)`` — compared against
our separable host and device renders.
"""

import math

import cv2
import numpy as np
import pytest

from dino_pose_tpu.data import heatmaps as H


def oracle(keypoints, image_size, heatmap_size=48, num_keypoints=24):
    width, height = image_size
    canvas = np.zeros((height, width, num_keypoints))
    sigma, th = 15.0, 1.6052
    delta = math.sqrt(th * 2)
    for i, point in enumerate(np.asarray(keypoints, np.float64)):
        if point[0] < 0 or point[1] < 0 or point[2] == 0:
            continue
        cx, cy = point[0], point[1]
        x_min = int(max(0, cx - delta * sigma))
        y_min = int(max(0, cy - delta * sigma))
        x_max = int(min(width, cx + delta * sigma))
        y_max = int(min(height, cy + delta * sigma))
        if x_min >= x_max or y_min >= y_max:
            continue
        yy, xx = np.ogrid[y_min:y_max, x_min:x_max]
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        canvas[y_min:y_max, x_min:x_max, i] = np.exp(-d2 / (2 * sigma**2))
    out = cv2.resize(canvas, (heatmap_size, heatmap_size), interpolation=cv2.INTER_CUBIC)
    return np.transpose(out, (2, 0, 1)).astype(np.float32)


def random_kps(rng, width, height, n=24):
    kps = np.stack(
        [
            rng.uniform(-30, width + 30, n),       # includes off-image x
            rng.uniform(-30, height + 30, n),
            rng.integers(0, 3, n).astype(np.float64),
        ],
        axis=1,
    )
    kps[0] = [-5.0, 40.0, 2.0]     # negative x -> skipped
    kps[1] = [40.0, 40.0, 0.0]     # invisible -> skipped
    kps[2] = [0.0, 0.0, 2.0]       # corner
    kps[3] = [width - 0.01, height - 0.01, 1.0]  # far corner
    return kps


def test_resize_matrix_matches_cv2():
    rng = np.random.default_rng(0)
    for src, dst in [(224, 48), (160, 48), (48, 48), (100, 224)]:
        img = rng.standard_normal((src, src)).astype(np.float64)
        want = cv2.resize(img, (dst, dst), interpolation=cv2.INTER_CUBIC)
        m_r = H.resize_matrix(src, dst)
        got = m_r @ img @ m_r.T
        # Taps are float32-exact; residual is cv2's separable-pass
        # accumulation order (~1e-6 absolute on unit-scale data).
        np.testing.assert_allclose(got, want, atol=5e-6)
        if src == dst:
            np.testing.assert_array_equal(m_r, np.eye(src))


@pytest.mark.parametrize("size", [(224, 224), (224, 160), (97, 131)])
def test_host_render_matches_oracle(size):
    rng = np.random.default_rng(1)
    kps = random_kps(rng, *size)
    want = oracle(kps, size)
    got = H.render_heatmaps_host(kps, size)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.all(got[0] == 0) and np.all(got[1] == 0)


def test_device_render_matches_host():
    rng = np.random.default_rng(2)
    batch = np.stack([random_kps(rng, 224, 224) for _ in range(3)]).astype(np.float32)
    got = np.asarray(H.render_heatmaps(batch))
    for b in range(3):
        want = H.render_heatmaps_host(batch[b], (224, 224))
        np.testing.assert_allclose(got[b], want, atol=2e-5)


def test_peak_location_and_value():
    # A centred visible keypoint produces a ~1.0 peak at the scaled location.
    kps = np.zeros((24, 3))
    kps[5] = [112.0, 112.0, 2.0]
    hm = H.render_heatmaps_host(kps, (224, 224))
    k = hm[5]
    iy, ix = np.unravel_index(k.argmax(), k.shape)
    assert abs(iy - 24) <= 1 and abs(ix - 24) <= 1
    assert 0.98 < k.max() <= 1.001
    assert np.all(hm[[i for i in range(24) if i != 5]] == 0)
