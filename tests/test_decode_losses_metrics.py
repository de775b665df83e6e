"""Decode / loss / weighting / metric parity against hand-derived golden
implementations of the reference formulas (see SURVEY.md §2.1 rows: decode,
losses, dynamic loss weighting, PCKh metrics)."""

import jax.numpy as jnp
import numpy as np

from dino_pose_tpu.constants import COM_WEIGHTS, KeyPoints
from dino_pose_tpu.data.keypoints import denormalize_z, normalize_z
from dino_pose_tpu.ops.decode import decode_heatmaps, heatmap_confidences
from dino_pose_tpu.train import losses, metrics, weighting


# ---------------------------------------------------------------------------
# Golden numpy implementations (written from the reference *spec*)
# ---------------------------------------------------------------------------

def golden_weighted_max_loc(heatmap, target_size):
    cy, cx = np.unravel_index(np.argmax(heatmap), heatmap.shape)
    y0, y1 = max(0, cy - 2), min(heatmap.shape[0], cy + 3)
    x0, x1 = max(0, cx - 2), min(heatmap.shape[1], cx + 3)
    crop = heatmap[y0:y1, x0:x1]
    lx = np.sum((0.5 + np.arange(x0, x1)) * crop.sum(axis=0)) / crop.sum()
    ly = np.sum((0.5 + np.arange(y0, y1)) * crop.sum(axis=1)) / crop.sum()
    return lx / heatmap.shape[1] * target_size[0], ly / heatmap.shape[0] * target_size[1]


def golden_z_coords(kps, z3d):
    vis = np.array([1 if p[2] != 0 else 0 for p in kps])
    scale = (np.std(kps[:, 0] * vis) + np.std(kps[:, 1] * vis)) / 2
    if scale == 0:
        scale = np.finfo(np.float32).eps
    return (z3d - np.sum(z3d * COM_WEIGHTS)) / scale


def golden_pckh(pred, target, ratio):
    top, neck = target[0], target[1]
    if top[2] == 0 or neck[2] == 0:
        top, neck = target[8], target[11]
        if top[2] == 0 or neck[2] == 0:
            return 0.0
    thresh = np.hypot(top[0] - neck[0], top[1] - neck[1]) * ratio
    correct = total = 0
    for k in range(pred.shape[0]):
        if target[k, 2] == 0:
            continue
        if np.sqrt(np.sum((pred[k] - target[k, :2]) ** 2)) < thresh:
            correct += 1
        total += 1
    return correct / total if total else 0.0


def golden_pckh_z(pred_z, target_z, target_kps, thresh):
    vis = np.array([1 if p[2] != 0 else 0 for p in target_kps])
    scale = (np.std(target_kps[:, 0] * vis) + np.std(target_kps[:, 1] * vis)) / 2
    if scale == 0:
        scale = np.finfo(np.float32).eps
    com = np.sum(target_z * COM_WEIGHTS)
    pred_ann = pred_z * scale + com
    if target_kps[0, 2] > 0 and target_kps[1, 2] > 0:
        ref = np.sqrt(
            (target_kps[0, 0] - target_kps[1, 0]) ** 2
            + (target_kps[0, 1] - target_kps[1, 1]) ** 2
            + (target_z[0] - target_z[1]) ** 2
        )
    else:
        ref = np.std(target_z[target_z != 0])
    return np.nanmean(np.abs(pred_ann - target_z) < thresh * ref)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_decode_matches_golden(rng):
    hm = rng.random((3, 24, 48, 48)).astype(np.float32)
    got = np.asarray(decode_heatmaps(jnp.asarray(hm), (224, 224)))
    for b in range(3):
        for k in range(24):
            lx, ly = golden_weighted_max_loc(hm[b, k], (224, 224))
            np.testing.assert_allclose(got[b, k], [lx, ly], rtol=1e-4)
    conf = np.asarray(heatmap_confidences(jnp.asarray(hm)))
    np.testing.assert_allclose(conf, hm.max(axis=(2, 3)), rtol=1e-6)


def test_decode_edge_peaks():
    hm = np.zeros((1, 2, 48, 48), np.float32)
    hm[0, 0, 0, 0] = 1.0      # corner peak -> clamped window
    hm[0, 1, 47, 47] = 1.0
    got = np.asarray(decode_heatmaps(jnp.asarray(hm), (48, 48)))
    np.testing.assert_allclose(got[0, 0], [0.5, 0.5])
    np.testing.assert_allclose(got[0, 1], [47.5, 47.5])


def test_keypoint_loss_matches_golden(rng):
    pred = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    tgt = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    conf = rng.integers(0, 3, (2, 4)).astype(np.float32)
    diff = (pred - tgt) ** 2
    golden = np.mean(np.exp(-diff) * diff * (conf > 1)[..., None, None])
    got = float(losses.keypoint_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(conf)))
    np.testing.assert_allclose(got, golden, rtol=1e-5)


def test_z_loss_matches_golden(rng):
    pred = rng.standard_normal((2, 24)).astype(np.float32)
    tgt = rng.standard_normal((2, 24)).astype(np.float32)
    conf = rng.integers(0, 3, (2, 24)).astype(np.float32)
    m = (conf > 1).astype(np.float32)
    golden = np.mean(np.abs(pred * m - tgt * m))
    got = float(losses.z_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(conf)))
    np.testing.assert_allclose(got, golden, rtol=1e-5)


def test_dynamic_weighting_tracks_reference_recurrence():
    state = weighting.LossWeightState.create(0.1)
    # Golden recurrence (reference DynamicLossWeighting.update + balanced loss).
    w, kp_avg, z_avg = 0.1, None, None
    series = [(0.5, 0.05), (0.4, 0.08), (0.3, 0.02)]
    for kp, z in series:
        state = weighting.update(state, jnp.float32(kp), jnp.float32(z))
        if kp_avg is None:
            kp_avg, z_avg = kp, z
        else:
            kp_avg = 0.9 * kp_avg + 0.1 * kp
            z_avg = 0.9 * z_avg + 0.1 * z
        w = np.clip(0.9 * w + 0.1 * (kp + 1e-8) / (z + 1e-8), 1e-3, 10.0)
        np.testing.assert_allclose(float(state.weight), w, rtol=1e-6)
        np.testing.assert_allclose(float(state.kp_avg), kp_avg, rtol=1e-6)
        bal = kp / (kp_avg + 1e-8) + z / (z_avg + 1e-8)
        got = float(weighting.balanced_loss(state, jnp.float32(kp), jnp.float32(z)))
        np.testing.assert_allclose(got, bal, rtol=1e-6)
        val = kp + w * z
        np.testing.assert_allclose(
            float(weighting.validation_loss(state, jnp.float32(kp), jnp.float32(z))),
            val,
            rtol=1e-6,
        )

    s2 = weighting.update_best(state, jnp.float32(0.2))
    assert float(s2.best_val_loss) == np.float32(0.2)
    s3 = weighting.update_best(s2, jnp.float32(0.3))
    assert float(s3.best_val_loss) == np.float32(0.2)


def test_z_normalization_round_trip(rng):
    kps = rng.uniform(0, 224, (24, 3)).astype(np.float32)
    kps[:, 2] = rng.integers(0, 3, 24)
    kps[0, 2] = 2  # keep reference joints visible
    kps[1, 2] = 2
    z3d = rng.standard_normal(24).astype(np.float32) * 50

    zn = np.asarray(normalize_z(jnp.asarray(kps), jnp.asarray(z3d)))
    np.testing.assert_allclose(zn, golden_z_coords(kps, z3d), rtol=1e-4)

    back = np.asarray(denormalize_z(jnp.asarray(zn), jnp.asarray(z3d), jnp.asarray(kps)))
    com = np.sum(z3d * COM_WEIGHTS)
    np.testing.assert_allclose(back, z3d - com + com, atol=1e-2)


def test_pckh_2d_matches_golden(rng):
    for trial in range(5):
        target = rng.uniform(0, 224, (2, 24, 3)).astype(np.float32)
        target[..., 2] = rng.integers(0, 3, (2, 24))
        if trial == 1:
            target[0, [0, 1], 2] = 0  # force hip fallback
        if trial == 2:
            target[0, [0, 1, 8, 11], 2] = 0  # force zero score
        pred = target[..., :2] + rng.standard_normal((2, 24, 2)).astype(np.float32) * 20
        got = np.asarray(metrics.pckh_2d(jnp.asarray(pred), jnp.asarray(target), 0.5))
        want = [golden_pckh(pred[b], target[b], 0.5) for b in range(2)]
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_pckh_z_matches_golden(rng):
    for trial in range(4):
        target = rng.uniform(0, 224, (2, 24, 3)).astype(np.float32)
        target[..., 2] = rng.integers(0, 3, (2, 24))
        if trial == 1:
            target[0, [0, 1], 2] = 0  # std fallback path
        tz = rng.standard_normal((2, 24)).astype(np.float32) * 40
        pz = rng.standard_normal((2, 24)).astype(np.float32)
        got = np.asarray(metrics.pckh_z(jnp.asarray(pz), jnp.asarray(tz), jnp.asarray(target), 0.5))
        want = [golden_pckh_z(pz[b], tz[b], target[b], 0.5) for b in range(2)]
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pck_bbox_sanity(rng):
    target = rng.uniform(0, 224, (3, 24, 3)).astype(np.float32)
    target[..., 2] = 2
    perfect = np.asarray(metrics.pck_bbox(jnp.asarray(target[..., :2]), jnp.asarray(target), 0.2))
    np.testing.assert_allclose(perfect, 1.0)
    awful = np.asarray(
        metrics.pck_bbox(jnp.asarray(target[..., :2] + 1e5), jnp.asarray(target), 0.2)
    )
    np.testing.assert_allclose(awful, 0.0)


def test_decode_zero_heatmap_nan_and_guard(monkeypatch):
    """All-zero channel: NaN coords bug-for-bug with the reference's numpy
    division (src/model_utils.py:44-47); DINO_POSE_TPU_DECODE_GUARD=1 swaps
    in the argmax cell centre for eval debugging on untrained models."""
    from dino_pose_tpu.ops import decode

    hm = np.zeros((1, 2, 48, 48), np.float32)
    hm[0, 1, 10, 20] = 1.0  # second channel has a real peak

    out = decode.decode_heatmaps(jnp.asarray(hm), (224, 224))
    assert np.isnan(np.asarray(out)[0, 0]).all()
    assert np.isfinite(np.asarray(out)[0, 1]).all()

    monkeypatch.setattr(decode, "_GUARD_ZERO_WINDOW", True)
    out = np.asarray(decode.decode_heatmaps(jnp.asarray(hm), (224, 224)))
    assert np.isfinite(out).all()
    # Guarded zero channel lands on the argmax cell centre (cell 0,0).
    np.testing.assert_allclose(out[0, 0], [0.5 / 48 * 224, 0.5 / 48 * 224], atol=1e-4)
    # Real peak unchanged by the guard.
    np.testing.assert_allclose(out[0, 1], [20.5 / 48 * 224, 10.5 / 48 * 224], atol=1e-4)
