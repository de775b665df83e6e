"""Device-warp fast input path: geometry parity with the host PIL chain."""

import json

import numpy as np
import pytest
from PIL import Image

from dino_pose_tpu.config import get_default_configs
from dino_pose_tpu.data.dataset import create_dataloaders

K = 24


def make_coco(tmp_path, n=8, w=320, h=280, smooth=True):
    (tmp_path / "images").mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(n):
        # smooth gradient image: resampling differences stay small
        gx = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
        gy = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
        arr = np.concatenate(
            [np.broadcast_to(gx, (h, w, 1)), np.broadcast_to(gy, (h, w, 1)),
             np.full((h, w, 1), 128, np.float32)], axis=2
        ).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "images" / f"{i}.png")
        kps = np.stack(
            [rng.uniform(20, w - 20, K), rng.uniform(20, h - 20, K), np.full(K, 2.0)], 1
        )
        images.append({"id": i, "file_name": f"{i}.png", "width": w, "height": h})
        annotations.append(
            {"id": i, "image_id": i, "num_keypoints": K,
             "keypoints": kps.reshape(-1).tolist(),
             "keypoints_z": rng.uniform(-40, 40, K).tolist()}
        )
    (tmp_path / "ann.json").write_text(
        json.dumps({"images": images, "annotations": annotations})
    )
    return tmp_path


def loaders(root, preproc_overrides, device_warp):
    _, _, config_preproc, config_model = get_default_configs()
    config_preproc.update(preproc_overrides)
    return create_dataloaders(
        config_preproc, config_model, root / "images", root / "ann.json",
        batch_size=4, num_workers=1, device_warp=device_warp,
        render_targets=not device_warp, seed=0,
    )


GEOM_ONLY = dict(is_rotate=False, is_flipping=False, is_occultation=False,
                 is_scale=False, pre_crop=False)


def test_warp_matches_host_geometry(tmp_path):
    """No rotation/occlusion: the single-gather warp must closely match the
    PIL resize chain on a smooth image (sub-1% normalised-unit error)."""
    from dino_pose_tpu.data.warp import warp_batch

    root = make_coco(tmp_path)
    dw = next(iter(loaders(root, GEOM_ONLY, device_warp=True)))
    host = next(iter(loaders(root, GEOM_ONLY, device_warp=False)))

    np.testing.assert_array_equal(dw["2d_keypoints"], host["2d_keypoints"])
    np.testing.assert_array_equal(dw["z_coords"], host["z_coords"])

    img = np.asarray(
        warp_batch(dw["canvas"], dw["affine"], dw["pad_color"], dw["src_wh"],
                   dw["occ"], dw["f3_affine"], dw["f2_affine"], dw["frame"])
    )
    assert img.shape == host["image"].shape == (4, 3, 224, 224)
    # interior crop: avoid border-handling differences
    a = img[:, :, 10:-10, 10:-10]
    b = host["image"][:, :, 10:-10, 10:-10]
    assert np.mean(np.abs(a - b)) < 0.01, np.mean(np.abs(a - b))


def test_warp_matches_host_with_rotation(tmp_path):
    """Rotation enabled: the composed affine must still align the warped
    pixels with the PIL chain (catches compose-order regressions, where the
    error jumps to ~0.7 normalised units)."""
    from dino_pose_tpu.data.warp import warp_batch

    root = make_coco(tmp_path)
    cfg = dict(GEOM_ONLY, is_rotate=True)
    dw = next(iter(loaders(root, cfg, device_warp=True)))
    host = next(iter(loaders(root, cfg, device_warp=False)))

    np.testing.assert_array_equal(dw["2d_keypoints"], host["2d_keypoints"])
    img = np.asarray(
        warp_batch(dw["canvas"], dw["affine"], dw["pad_color"], dw["src_wh"],
                   dw["occ"], dw["f3_affine"], dw["f2_affine"], dw["frame"])
    )
    a = img[:, :, 20:-20, 20:-20]
    b = host["image"][:, :, 20:-20, 20:-20]
    assert np.mean(np.abs(a - b)) < 0.05, np.mean(np.abs(a - b))


def test_warp_full_chain_runs_and_occludes(tmp_path):
    from dino_pose_tpu.data.warp import warp_batch

    root = make_coco(tmp_path)
    # deterministic occlusion: force with a dedicated seed scan
    loader = loaders(root, {}, device_warp=True)
    batch = next(iter(loader))
    img = np.asarray(
        warp_batch(batch["canvas"], batch["affine"], batch["pad_color"],
                   batch["src_wh"], batch["occ"], batch["f3_affine"],
                   batch["f2_affine"], batch["frame"])
    )
    assert np.all(np.isfinite(img))
    from dino_pose_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

    black = (-IMAGENET_MEAN / IMAGENET_STD).astype(np.float32)
    for b in range(4):
        x0, x1, y0, y1 = batch["occ"][b]
        if x1 - x0 > 4 and y1 - y0 > 4:
            xi, yi = int(x0) + 2, int(y0) + 2
            if 0 <= xi < 224 and 0 <= yi < 224:
                np.testing.assert_allclose(img[b, :, yi, xi], black, atol=1e-4)


def test_warp_train_step_integration(tmp_path):
    """A full jitted train step consumes a device-warp batch."""
    import jax.numpy as jnp

    from dino_pose_tpu.models import registry
    from dino_pose_tpu.train.state import create_train_state
    from dino_pose_tpu.train.step import jit_train_step

    root = make_coco(tmp_path)
    loader = loaders(root, {}, device_warp=True)
    batch = next(iter(loader))

    config = {"model_name": "test/vit-tiny", "num_keypoints": 24,
              "output_heatmap_size": 48, "use_lora": True}
    model = registry.create_model_from_config(config, pretrained=False)
    state, tx, part = create_train_state(model.variables, config, model.family)
    step = jit_train_step(model.module, tx, part,
                          device_targets=(224, 48), compute_dtype=jnp.float32)
    import jax

    state2, stats = step(state, batch, jnp.float32(1e-3), jax.random.key(0))
    assert np.isfinite(float(stats["loss"]))


def test_warp_matches_host_with_flip(tmp_path):
    """Flip enabled: PIL FLIP_LEFT_RIGHT mirrors pixel indices (x -> w-1-x);
    the previous w-x affine shifted every flipped sample one pixel."""
    from dino_pose_tpu.data.warp import warp_batch

    root = make_coco(tmp_path)
    cfg = dict(GEOM_ONLY, is_flipping=True)
    dw = next(iter(loaders(root, cfg, device_warp=True)))
    host = next(iter(loaders(root, cfg, device_warp=False)))

    np.testing.assert_array_equal(dw["2d_keypoints"], host["2d_keypoints"])
    img = np.asarray(
        warp_batch(dw["canvas"], dw["affine"], dw["pad_color"], dw["src_wh"],
                   dw["occ"], dw["f3_affine"], dw["f2_affine"], dw["frame"])
    )
    a = img[:, :, 10:-10, 10:-10]
    b = host["image"][:, :, 10:-10, 10:-10]
    assert np.mean(np.abs(a - b)) < 0.01, np.mean(np.abs(a - b))


def test_warp_rotation_black_fill_with_pre_crop(tmp_path):
    """Rotation + pre_crop (the production default): pixels rotated out of
    the source must be BLACK like PIL's fill, not content leaked from the
    pre-crop region of the original image."""
    from dino_pose_tpu.data.warp import warp_batch

    root = make_coco(tmp_path)
    cfg = dict(GEOM_ONLY, is_rotate=True, pre_crop=True)
    dw = next(iter(loaders(root, cfg, device_warp=True)))
    host = next(iter(loaders(root, cfg, device_warp=False)))

    np.testing.assert_array_equal(dw["2d_keypoints"], host["2d_keypoints"])
    img = np.asarray(
        warp_batch(dw["canvas"], dw["affine"], dw["pad_color"], dw["src_wh"],
                   dw["occ"], dw["f3_affine"], dw["f2_affine"], dw["frame"])
    )
    a = img[:, :, 5:-5, 5:-5]
    b = host["image"][:, :, 5:-5, 5:-5]
    # Pre-fix this was ~0.09 (corners sampled real content where the host
    # chain has black); with the F2-frame mask it is interpolation-level.
    assert np.mean(np.abs(a - b)) < 0.02, np.mean(np.abs(a - b))


@pytest.mark.slow
def test_device_warp_train_step_end_to_end(tmp_path):
    """The jitted production step consumes a device-warp batch directly:
    canvases warp in-jit, Gaussian targets render in-step, every warp key
    is popped before the model sees the batch."""
    import jax
    import jax.numpy as jnp

    from dino_pose_tpu.models import registry
    from dino_pose_tpu.train.state import create_train_state
    from dino_pose_tpu.train.step import jit_train_step

    root = make_coco(tmp_path)
    batch = next(iter(loaders(root, {}, device_warp=True)))
    config = {"model_name": "test/vit-tiny", "num_keypoints": K,
              "output_heatmap_size": 48, "use_lora": False}
    model = registry.create_model_from_config(config, pretrained=False)
    state, tx, part = create_train_state(model.variables, config, model.family)

    with pytest.raises(ValueError, match="device_targets"):
        jit_train_step(model.module, tx, part)(
            state, jax.tree.map(jnp.asarray, batch),
            jnp.float32(1e-3), jax.random.key(0),
        )

    step = jit_train_step(model.module, tx, part, device_targets=(224, 48))
    state, stats = step(
        state, jax.tree.map(jnp.asarray, batch),
        jnp.float32(1e-3), jax.random.key(0),
    )
    assert np.isfinite(float(stats["loss"]))
