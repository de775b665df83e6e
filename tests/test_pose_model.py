"""End-to-end model construction, forward contract, bridge round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_pose_tpu.io import torch_bridge as tb
from dino_pose_tpu.models import registry
from dino_pose_tpu.train.partition import trainable_mask


@pytest.fixture(scope="module")
def tiny_model():
    return registry.create_model_from_config(
        {"model_name": "test/vit-tiny", "num_keypoints": 24, "output_heatmap_size": 48},
        pretrained=False,
    )


def test_forward_contract(tiny_model):
    x = jnp.zeros((2, 3, 224, 224), jnp.float32)
    heatmaps, z = tiny_model.apply(x)
    assert heatmaps.shape == (2, 24, 48, 48)
    assert z.shape == (2, 24)


def test_train_mode_returns_batch_stats(tiny_model):
    x = jnp.zeros((2, 3, 224, 224), jnp.float32)
    (heatmaps, z), mutated = tiny_model.apply(
        x, train=True, rngs={"dropout": jax.random.key(0)}
    )
    assert "batch_stats" in mutated
    assert heatmaps.shape == (2, 24, 48, 48)


def test_bridge_round_trip(tiny_model):
    rules = tb.dinov2_pose_rules(num_layers=2)
    state = tb.export_params(tiny_model.variables, rules)
    assert "backbone.embeddings.cls_token" in state
    assert "pose_heads.heatmap_head.feature_refine.0.weight" in state
    assert "pose_heads.z_head.mlp.9.weight" in state

    # Zero the tree, re-import, and confirm full restoration.
    zeroed = jax.tree.map(jnp.zeros_like, tiny_model.variables)
    restored = tb.import_params(zeroed, state, rules)
    for path, val in jax.tree_util.tree_leaves_with_path(restored):
        orig = tiny_model.variables
        for p in path:
            orig = orig[p.key]
        np.testing.assert_array_equal(np.asarray(val), np.asarray(orig))


def test_family_alias_resolution():
    assert registry.resolve_model_name("dinov2") == "facebook/dinov2-small"
    assert registry.resolve_model_name("fastvit") == "timm/fastvit_t8.apple_in1k"
    assert registry.resolve_model_name("facebook/dinov2-base") == "facebook/dinov2-base"
    fams = registry.list_families()
    assert set(fams) == {"dinov2", "fastvit"}
    production = [m for m in fams["fastvit"]["models"] if not m.startswith("test/")]
    assert len(production) == 5  # t8, ma36, sa12, sa24, sa36


def test_trainable_masks(tiny_model):
    params = tiny_model.variables["params"]

    # Frozen backbone: only heads train.
    from flax import traverse_util

    mask = trainable_mask(params, {"use_lora": False, "unfreeze_last_n_layers": 0}, "dinov2")
    fm = traverse_util.flatten_dict(mask)
    assert all(v for p, v in fm.items() if p[0] == "pose_heads")
    assert not any(v for p, v in fm.items() if p[0] == "backbone")

    # Unfreeze last 1 of 2 layers.
    mask = trainable_mask(params, {"use_lora": False, "unfreeze_last_n_layers": 1}, "dinov2")
    fm = traverse_util.flatten_dict(mask)
    assert all(v for p, v in fm.items() if "layer1" in p)
    assert not any(v for p, v in fm.items() if "layer0" in p)


def test_lora_trainable_mask():
    model = registry.create_model_from_config(
        {
            "model_name": "test/vit-tiny",
            "num_keypoints": 24,
            "output_heatmap_size": 48,
            "use_lora": True,
            "lora_rank": 4,
        },
        pretrained=False,
    )
    from flax import traverse_util

    params = model.variables["params"]
    fm = traverse_util.flatten_dict(
        trainable_mask(params, model.config_model, "dinov2")
    )
    backbone_trainable = [p for p, v in fm.items() if v and p[0] == "backbone"]
    assert backbone_trainable and all("lora_output" in p for p in backbone_trainable)
    assert all(v for p, v in fm.items() if p[0] == "pose_heads")


def test_bridge_rules_follow_heatmap_size():
    """Bridge rules must derive the upsampling-stage count from the model's
    geometry: with output_heatmap_size=96 the heads build up0..up2, and a
    rule table hardcoding 2 stages would silently skip up2 on save/restore."""
    from dino_pose_tpu.io.checkpoint import rules_for_model

    model = registry.create_model_from_config(
        {"model_name": "test/vit-tiny", "num_keypoints": 24,
         "output_heatmap_size": 96},
        pretrained=False,
    )
    rules = rules_for_model(model)
    rule_paths = {"/".join(r.flax_path) for r in rules}
    assert any("up2" in p for p in rule_paths)
    # Every head param in the built tree is covered by a rule.
    from jax.tree_util import tree_flatten_with_path

    from dino_pose_tpu.core.sharding import _path_str

    tree_paths = {
        "params/" + _path_str(p)
        for p, _ in tree_flatten_with_path(model.variables["params"])[0]
    }
    head_paths = {p for p in tree_paths if "/pose_heads/" in p}
    missing = head_paths - rule_paths
    assert not missing, sorted(missing)[:5]
    # And the exporter runs over the full tree without KeyErrors.
    exported = tb.export_params(model.variables, rules)
    assert any(".up2." in k or "upsampling.2" in k for k in exported)


def test_adaptive_avg_pool_matches_torch():
    import torch

    from dino_pose_tpu.models.heads import adaptive_avg_pool

    x = np.random.default_rng(3).standard_normal((2, 48, 48, 5)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), 40))
    want = (
        torch.nn.AdaptiveAvgPool2d(40)(torch.tensor(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mlp_heatmap_head_overshoot_pools_to_target():
    from dino_pose_tpu.models.heads import HeatmapHead

    head = HeatmapHead(heatmap_size=40)
    x = jnp.ones((1, 384), jnp.float32)
    variables = head.init(jax.random.key(0), x, train=False)
    out = head.apply(variables, x, train=False)
    assert out.shape == (1, 40, 40, 24), out.shape
