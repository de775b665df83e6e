"""Dataset-level PCKh evaluation (batched, padded final batch)."""

import json

import numpy as np
import pytest
from PIL import Image

from dino_pose_tpu.models import registry
from dino_pose_tpu.train.evaluate import compute_pckh_dataset

K = 24


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval")
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(5):  # 5 images, batch 4 -> exercises final-batch padding
        w, h = 300, 260
        Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)).save(
            root / "images" / f"{i}.jpg"
        )
        kps = np.stack(
            [rng.uniform(30, w - 30, K), rng.uniform(30, h - 30, K), np.full(K, 2.0)], 1
        )
        images.append({"id": i, "file_name": f"{i}.jpg", "width": w, "height": h})
        annotations.append(
            {"id": i, "image_id": i, "num_keypoints": K,
             "keypoints": kps.reshape(-1).tolist(),
             "keypoints_z": rng.uniform(-40, 40, K).tolist()}
        )
    (root / "ann.json").write_text(json.dumps({"images": images, "annotations": annotations}))
    return root


def test_compute_pckh_dataset(data):
    model = registry.create_model_from_config(
        {"model_name": "test/vit-tiny", "num_keypoints": K, "output_heatmap_size": 48},
        pretrained=False,
    )
    p2d, p3d = compute_pckh_dataset(
        model, data / "images", data / "ann.json", batch_size=4, num_workers=2
    )
    assert 0.0 <= p2d <= 1.0 and 0.0 <= p3d <= 1.0

    full = compute_pckh_dataset(
        model, data / "images", data / "ann.json", batch_size=4, return_all=True
    )
    assert set(full) == {"pckh", "pckh_z", "pck_bbox", "pckh_fc", "pck_bbox_fc"}
    assert full["pckh"] == pytest.approx(p2d, abs=1e-6)
    assert 0.0 <= full["pck_bbox"] <= 1.0


def test_eval_localizes_mesh_replicated_state(data):
    """Dataset eval must run as a LOCAL single-device program even when the
    live training state is replicated over a mesh and the kernel-dispatch
    target still points at that mesh (the epoch-end situation inside fit):
    tracing eval through the training shard_map would emit cross-process
    collectives and non-addressable outputs on multi-host jobs."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dino_pose_tpu.ops import dispatch

    model = registry.create_model_from_config(
        {"model_name": "test/vit-tiny", "num_keypoints": K, "output_heatmap_size": 48},
        pretrained=False,
    )
    baseline = compute_pckh_dataset(
        model, data / "images", data / "ann.json", batch_size=4, return_all=True
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    replicated = NamedSharding(mesh, P())
    model.variables = jax.device_put(model.variables, replicated)
    dispatch.configure_for_mesh(mesh)
    try:
        got = compute_pckh_dataset(
            model, data / "images", data / "ann.json", batch_size=4, return_all=True
        )
        # The mesh target must be restored after eval's local() scope.
        assert dispatch.target_mesh() is mesh
    finally:
        dispatch._DISPATCH = None
        dispatch._MESH = None
    for k in baseline:
        assert got[k] == pytest.approx(baseline[k], abs=1e-5)
