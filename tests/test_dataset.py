"""End-to-end data pipeline test on a synthetic COCO-format dataset."""

import json

import numpy as np
import pytest
from PIL import Image

from dino_pose_tpu.config import get_default_configs
from dino_pose_tpu.data.dataset import create_dataloaders, pad_batch

K = 24


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(7):
        w, h = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        name = f"img_{i}.jpg"
        Image.fromarray(arr).save(root / "images" / name)
        kps = np.stack(
            [
                rng.uniform(10, w - 10, K),
                rng.uniform(10, h - 10, K),
                rng.integers(1, 3, K).astype(float),
            ],
            axis=1,
        )
        kps[0, 2] = 0  # one invisible keypoint
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        annotations.append(
            {
                "id": i,
                "image_id": i,
                "num_keypoints": K,
                "keypoints": kps.reshape(-1).tolist(),
                "keypoints_z": rng.uniform(-50, 50, K).tolist(),
            }
        )
    (root / "ann.json").write_text(
        json.dumps({"images": images, "annotations": annotations})
    )
    return root


def make_loader(coco_dir, **kw):
    _, _, config_preproc, config_model = get_default_configs()
    return create_dataloaders(
        config_preproc,
        config_model,
        coco_dir / "images",
        coco_dir / "ann.json",
        batch_size=kw.pop("batch_size", 4),
        num_workers=2,
        **kw,
    )


def test_loader_shapes_and_types(coco_dir):
    loader = make_loader(coco_dir)
    assert len(loader) == 1  # 7 samples, bs=4, drop_last
    (batch,) = list(loader)
    assert batch["image"].shape == (4, 3, 224, 224)
    assert batch["2d_heatmaps"].shape == (4, K, 48, 48)
    assert batch["2d_keypoints"].shape == (4, K, 3)
    assert batch["z_coords"].shape == (4, K)
    for v in batch.values():
        assert v.dtype == np.float32
    # Targets of visible keypoints peak near 1; confidences carried through.
    assert batch["2d_heatmaps"].max() > 0.5


def test_epochs_reshuffle_and_redraw(coco_dir):
    loader = make_loader(coco_dir)
    b0 = next(iter(loader))
    b1 = next(iter(loader))
    assert not np.array_equal(b0["image"], b1["image"])


def test_no_transform_is_deterministic(coco_dir):
    loader = make_loader(coco_dir, transform=False, shuffle=False, drop_last=False)
    a = list(loader)
    b = list(loader)
    assert len(a) == 2  # ceil(7/4)
    for x, y in zip(a, b):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_device_side_targets_mode(coco_dir):
    """render_targets=False omits heatmaps; device render matches host."""
    from dino_pose_tpu.data.heatmaps import render_heatmaps

    loader = make_loader(coco_dir, render_targets=False, transform=True)
    batch = next(iter(loader))
    assert "2d_heatmaps" not in batch
    hm = np.asarray(render_heatmaps(batch["2d_keypoints"]))
    assert hm.shape == (4, K, 48, 48)

    host_loader = make_loader(coco_dir, render_targets=True, transform=True)
    host_batch = next(iter(host_loader))
    np.testing.assert_allclose(hm, host_batch["2d_heatmaps"], atol=2e-5)


def test_pad_batch(coco_dir):
    loader = make_loader(coco_dir, drop_last=False, shuffle=False)
    batches = list(loader)
    short = batches[-1]
    padded, valid = pad_batch(short, 4)
    assert padded["image"].shape[0] == 4
    assert valid.tolist() == [True, True, True, False]


def test_keypoint_count_mismatch_raises(coco_dir):
    _, _, config_preproc, config_model = get_default_configs()
    config_model = dict(config_model, num_keypoints=17)
    with pytest.raises(ValueError, match="does not match"):
        create_dataloaders(
            config_preproc,
            config_model,
            coco_dir / "images",
            coco_dir / "ann.json",
        )


def test_set_epoch_fast_forwards_stream(coco_dir):
    """Auto-resume continues the shuffle/augmentation stream at start_epoch
    instead of replaying epoch 0 (loaders seed per epoch)."""
    a = make_loader(coco_dir)
    list(a), list(a)  # consume epochs 0 and 1
    b2 = next(iter(a))  # epoch 2

    b = make_loader(coco_dir)
    b.set_epoch(2)
    c2 = next(iter(b))
    np.testing.assert_array_equal(b2["image"], c2["image"])
