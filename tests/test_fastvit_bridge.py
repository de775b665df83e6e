"""FastViT .pth bridge: full round-trip, key schema, reference heuristics."""

import jax.numpy as jnp
import numpy as np
import pytest

from dino_pose_tpu.io import checkpoint as ck
from dino_pose_tpu.models import registry

# Full FastViT bridge round-trips.
pytestmark = pytest.mark.slow

CONFIG = {
    "model_name": "test/fastvit-tiny",
    "num_keypoints": 24,
    "output_heatmap_size": 48,
    "use_lora": True,
    "lora_rank": 4,
    "lora_dropout": 0.0,
}


@pytest.fixture(scope="module")
def model():
    m = registry.create_model_from_config(CONFIG, pretrained=False)
    # Non-trivial batch stats so BN bridging is exercised.
    import jax

    rng = np.random.default_rng(0)
    m.variables = {
        "params": m.variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: jnp.asarray(rng.uniform(0.5, 1.5, v.shape), jnp.float32),
            m.variables["batch_stats"],
        ),
    }
    return m


def forward(m):
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 3, 128, 128)), jnp.float32
    )
    hm, z = m.apply(x)
    return np.asarray(hm), np.asarray(z)


def test_rules_cover_every_variable(model):
    from flax import traverse_util

    rules = ck.rules_for_model(model)
    rule_paths = {r.flax_path for r in rules}
    all_paths = set(traverse_util.flatten_dict(model.variables).keys())
    missing = all_paths - rule_paths
    assert not missing, sorted(missing)[:10]
    extra = rule_paths - all_paths
    assert not extra, sorted(extra)[:10]


def test_pth_roundtrip_identity(model, tmp_path):
    path = tmp_path / "fastvit.pth"
    ck.save_checkpoint(path, model, epoch=2)

    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    keys = list(raw["model_state_dict"].keys())
    key_str = " ".join(keys)
    # Reference family-detection indicators (export_coreml.py:113-145).
    assert "backbone.stages" in key_str
    assert "lora_A" in key_str
    assert any("mlp.fc1.original_conv.weight" in k for k in keys)
    assert any("mlp.fc1.lora_A.weight" in k for k in keys)
    assert raw["config_model"]["model_class"] == "FastVitPoseModelLoRA"

    # LoRA rank detection reads lora_A.weight shape[0] (export_coreml.py:132-136).
    k = next(k for k in keys if k.endswith("lora_A.weight"))
    assert raw["model_state_dict"][k].shape[0] == 4

    loaded = ck.load_model_smart(str(path))
    hm0, z0 = forward(model)
    hm1, z1 = forward(loaded)
    np.testing.assert_allclose(hm1, hm0, atol=1e-5)
    np.testing.assert_allclose(z1, z0, atol=1e-5)


def test_non_lora_keys(tmp_path):
    m = registry.create_model_from_config(
        {k: v for k, v in CONFIG.items() if not k.startswith("lora") and k != "use_lora"},
        pretrained=False,
    )
    path = tmp_path / "fastvit_std.pth"
    ck.save_checkpoint(path, m, epoch=0)
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    keys = list(raw["model_state_dict"].keys())
    assert any(k.startswith("backbone.stem.0.rbr_conv.0.conv.weight") for k in keys)
    assert any("mlp.fc1.weight" in k for k in keys)
    assert not any("lora" in k for k in keys)
    assert any(k.startswith("backbone.head.heatmap_head.") for k in keys)
