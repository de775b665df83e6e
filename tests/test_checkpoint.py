"""Checkpoint round-trips: native msgpack, torch .pth, smart loading, resume."""

import numpy as np
import jax.numpy as jnp
import pytest

from dino_pose_tpu.io import checkpoint as ck
from dino_pose_tpu.models import registry
from dino_pose_tpu.train.schedule import PlateauState
from dino_pose_tpu.train.state import create_train_state

CONFIG = {
    "model_name": "test/vit-tiny",
    "num_keypoints": 24,
    "output_heatmap_size": 48,
    "use_lora": True,
    "lora_rank": 4,
    "lora_alpha": 8,
    "lora_dropout": 0.0,
}


@pytest.fixture(scope="module")
def model():
    return registry.create_model_from_config(CONFIG, pretrained=False)


def forward(m):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 224, 224)), jnp.float32)
    hm, z = m.apply(x)
    return np.asarray(hm), np.asarray(z)


def test_native_roundtrip(tmp_path, model):
    state, _, _ = create_train_state(model.variables, CONFIG, model.family)
    state = state.replace(
        step=jnp.asarray(7, jnp.int32),
        loss_weight=state.loss_weight.replace(
            weight=jnp.asarray(0.42, jnp.float32),
            best_weight=jnp.asarray(0.37, jnp.float32),
        ),
    )
    sched = PlateauState(lr=3e-5, best=0.5, num_bad_epochs=2)
    path = tmp_path / "ckpt_epoch3.msgpack"
    ck.save_checkpoint(
        path, model, state=state, epoch=3, train_loss=1.5, valid_loss=2.5,
        config_training={"batch_size": 32}, config_preproc={"is_crop": True},
        scheduler=sched,
    )

    loaded = ck.load_model_smart(str(path))
    hm0, z0 = forward(model)
    hm1, z1 = forward(loaded)
    np.testing.assert_array_equal(hm0, hm1)
    np.testing.assert_array_equal(z0, z1)
    assert loaded.use_lora and loaded.model_name == "test/vit-tiny"

    # Resume restores optimizer/scheduler/loss-weight/step/epoch.
    fresh_state, _, _ = create_train_state(model.variables, CONFIG, model.family)
    ckpt = ck.load_checkpoint(path)
    resumed, sched2, epoch = ck.restore_train_state(ckpt, fresh_state, PlateauState(lr=3e-5))
    assert epoch == 3
    assert int(resumed.step) == 7
    assert float(resumed.loss_weight.weight) == pytest.approx(0.42)
    assert float(resumed.loss_weight.best_weight) == pytest.approx(0.37)
    assert sched2.best == pytest.approx(0.5) and sched2.num_bad_epochs == 2

    info = ck.get_model_info(str(path))
    assert info["epoch"] == 3
    assert info["model_type"] == "lora"
    assert info["class_name"] == "Dinov2PoseModelLoRA"
    # The scalar 'loss_weight' field records the best-validation weight,
    # matching the reference (train.py saves loss_weighting.best_weight).
    assert info["loss_weight"] == pytest.approx(0.37)


def test_pth_roundtrip_and_reference_detection(tmp_path, model):
    path = tmp_path / "ckpt.pth"
    ck.save_checkpoint(path, model, epoch=1, train_loss=0.1, valid_loss=0.2)

    # Keys satisfy the reference's family-detection heuristics
    # (/root/reference/export_coreml.py:16-165).
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    keys = list(raw["model_state_dict"].keys())
    key_str = " ".join(keys)
    assert "lora_A" in key_str                       # LoRA indicator
    assert "backbone.embeddings.cls_token" in keys   # DINOv2 indicator
    assert any(k.endswith("num_batches_tracked") for k in keys)
    assert raw["config_model"]["model_class"] == "Dinov2PoseModelLoRA"
    assert raw["model_architecture"]["heatmap_size"] == 48

    loaded = ck.load_model_smart(str(path))
    hm0, z0 = forward(model)
    hm1, z1 = forward(loaded)
    np.testing.assert_allclose(hm1, hm0, atol=1e-5)
    np.testing.assert_allclose(z1, z0, atol=1e-5)


def test_smart_load_registry_and_errors(tmp_path):
    m = ck.load_model_smart("test/vit-tiny")
    assert m.family == "dinov2"
    with pytest.raises(ValueError, match="Invalid model path"):
        ck.load_model_smart("not/a-model")
    with pytest.raises(ValueError, match="Invalid checkpoint path"):
        ck.get_model_info(str(tmp_path / "missing.pth"))


def test_latest_checkpoint(tmp_path, model):
    assert ck.latest_checkpoint(tmp_path / "nope") is None
    for i in range(2):
        ck.save_checkpoint(tmp_path / f"c{i}.msgpack", model, epoch=i)
    assert ck.latest_checkpoint(tmp_path).endswith("c1.msgpack")


def test_async_checkpoint_writer(tmp_path, model):
    """Async saves survive donation of the state buffers: the tree is
    snapshotted to host on the caller thread before save_checkpoint
    returns, so deleting the source arrays afterwards (what a donated
    train step does at the Python level — a no-op for buffer reuse on
    CPU, hence the explicit .delete()) cannot corrupt the write."""
    import jax

    state, tx, part = create_train_state(model.variables, CONFIG, model.family)
    snapshot = np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0])
    ).copy()

    writer = ck.AsyncCheckpointWriter()
    ck.save_checkpoint(
        tmp_path / "async.msgpack", model, state=state, epoch=1,
        async_writer=writer,
    )
    # Simulate the donated next step: on TPU, jit(donate_argnums=(0,))
    # marks every input ArrayImpl deleted the moment the step dispatches.
    # The CPU test backend ignores donation, so delete explicitly — under
    # the pre-fix implementation the writer thread then raised
    # 'Array has been deleted' from writer.wait().
    for leaf in jax.tree_util.tree_leaves(state):
        if isinstance(leaf, jax.Array):
            leaf.delete()
    writer.wait()

    ckpt = ck.load_checkpoint(tmp_path / "async.msgpack")
    assert ckpt["epoch"] == 1
    saved_leaf = jax.tree_util.tree_leaves(ckpt["variables"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(saved_leaf), snapshot)

    # Failures surface on wait(), not silently.
    writer.submit(lambda: (_ for _ in ()).throw(RuntimeError("disk full")))
    with pytest.raises(RuntimeError, match="disk full"):
        writer.wait()
