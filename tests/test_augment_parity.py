"""Augmentation-chain parity against the reference implementation.

The reference module only needs torch/PIL/cv2/numpy (its torchvision import is
unused — stubbed here), so we load it from the read-only mount, seed the
global RNGs, run its pipeline, then replay the identical draws through our
:class:`AugmentParams`/:func:`build_chain` and compare keypoints, z and the
produced image bytes.
"""

import importlib.machinery
import importlib.util
import math
import pathlib
import random
import sys
import types

import numpy as np
import pytest
from PIL import Image

from dino_pose_tpu.data import augment as A

REF = pathlib.Path("/root/reference/data_loader/data_augmentation.py")


def load_reference():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        # A module in sys.modules with __spec__ None makes importlib's
        # find_spec raise ValueError, which breaks transformers' optional-
        # dependency probing in other tests — give the stub a real spec.
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
        tv.transforms.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.transforms", loader=None
        )
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    spec = importlib.util.spec_from_file_location("ref_aug", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Proc:
    crop_size = {"width": 224, "height": 224}


def reference_pipeline(ref, img, kps, z, cfg):
    if cfg["pre_crop"]:
        img, kps = ref.pre_crop_image(img, kps)
    if cfg["is_scale"]:
        img, kps, z = ref.pose_random_scale(img, kps, z, cfg)
    if cfg["is_rotate"]:
        img, kps = ref.pose_rotation(img, kps, cfg)
    if cfg["is_flipping"]:
        img, kps, z = ref.pose_flip(img, kps, z)
    if cfg["is_resize_shortest_edge"]:
        img, kps, z = ref.pose_resize_shortestedge(img, kps, z, 224, _Proc())
    if cfg["is_crop"]:
        img, kps = ref.pose_crop(img, kps, 0, 0, 224, 224)
    if cfg["is_occultation"]:
        img = ref.random_occultation(img)
    return img, kps, z


def replay_params(seed, cfg, pad_needed):
    """Re-draw the reference's randomness in its exact order."""
    np.random.seed(seed)
    random.seed(seed)
    p = A.AugmentParams()
    if cfg["is_scale"]:
        p.scale_w = float(np.random.uniform(cfg["random_resize_min"], cfg["random_resize_max"]))
        p.scale_h = float(np.random.uniform(cfg["random_resize_min"], cfg["random_resize_max"]))
    if cfg["is_rotate"]:
        p.degrees = float(random.uniform(cfg["rotate_min_degree"], cfg["rotate_max_degree"]))
    if cfg["is_flipping"]:
        p.flip = bool(np.random.random() >= 0.5)
    if cfg["is_resize_shortest_edge"] and pad_needed:
        p.pad_color = tuple(int(np.random.randint(0, 256)) for _ in range(3))
    if cfg["is_occultation"]:
        p.occlude = bool(np.random.rand() >= 0.3)
        if p.occlude:
            p.occ_wfrac = float(0.5 * np.random.rand())
            p.occ_xfrac = float(np.random.rand())
            p.occ_hfrac = float(0.5 * np.random.rand())
            p.occ_yfrac = float(np.random.rand())
    return p


def make_sample(seed):
    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(300, 700)), int(rng.integers(300, 700))
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")
    kps = np.zeros((24, 3), np.float64)
    kps[:, 0] = rng.uniform(0.15 * w, 0.85 * w, 24)
    kps[:, 1] = rng.uniform(0.15 * h, 0.85 * h, 24)
    kps[:, 2] = rng.integers(1, 3, 24)
    kps[rng.integers(0, 24, 4), :] = 0.0  # some invisible points
    z = rng.standard_normal(24) * 30
    return img, kps, z


FULL_CFG = {
    "pre_crop": True,
    "is_scale": True,
    "random_resize_min": 0.7,
    "random_resize_max": 1.3,
    "is_rotate": True,
    "rotate_min_degree": -45,
    "rotate_max_degree": 45,
    "is_flipping": True,
    "is_resize_shortest_edge": True,
    "is_crop": True,
    "is_occultation": True,
}


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 7, 11, 13, 42])
def test_full_chain_matches_reference(seed):
    ref = load_reference()
    img, kps, z = make_sample(seed)

    np.random.seed(seed)
    random.seed(seed)
    ref_img, ref_kps, ref_z = reference_pipeline(
        ref, img.copy(), kps.copy(), z.copy(), FULL_CFG
    )

    # Pad only happens when the scaled/rotated image is smaller than 224.
    # Determine it from the spec first (replay without pad), then re-replay.
    p = replay_params(seed, FULL_CFG, pad_needed=False)
    spec, _, _ = A.build_chain(kps, z, img.size, p, FULL_CFG)
    if spec.pad_x or spec.pad_y:
        p = replay_params(seed, FULL_CFG, pad_needed=True)
        spec, got_kps, got_z = A.build_chain(kps, z, img.size, p, FULL_CFG)
    else:
        spec, got_kps, got_z = A.build_chain(kps, z, img.size, p, FULL_CFG)
    got_img = A.augment_image_host(img.copy(), spec, FULL_CFG)

    np.testing.assert_allclose(got_kps, ref_kps, atol=1e-9)
    np.testing.assert_allclose(got_z, ref_z, atol=1e-9)
    assert got_img.size == ref_img.size == (224, 224)
    np.testing.assert_array_equal(np.array(got_img), np.array(ref_img))


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.parametrize(
    "off", ["pre_crop", "is_scale", "is_rotate", "is_flipping", "is_occultation"]
)
def test_partial_chains_match_reference(off):
    ref = load_reference()
    cfg = dict(FULL_CFG)
    cfg[off] = False
    seed = 5
    img, kps, z = make_sample(seed)

    np.random.seed(seed)
    random.seed(seed)
    ref_img, ref_kps, ref_z = reference_pipeline(ref, img.copy(), kps.copy(), z.copy(), cfg)

    p = replay_params(seed, cfg, pad_needed=False)
    spec, got_kps, got_z = A.build_chain(kps, z, img.size, p, cfg)
    if spec.pad_x or spec.pad_y:
        p = replay_params(seed, cfg, pad_needed=True)
        spec, got_kps, got_z = A.build_chain(kps, z, img.size, p, cfg)
    got_img = A.augment_image_host(img.copy(), spec, cfg)

    np.testing.assert_allclose(got_kps, ref_kps, atol=1e-9)
    np.testing.assert_allclose(got_z, ref_z, atol=1e-9)
    np.testing.assert_array_equal(np.array(got_img), np.array(ref_img))
