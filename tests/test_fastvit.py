"""FastViT backbone/pose-model tests: shapes, LoRA identity, branch fusion."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from dino_pose_tpu.models import registry
from dino_pose_tpu.models.fastvit import (
    FASTVIT_PRESETS,
    FastViTConfig,
    MobileOneBlock,
    fuse_mobileone_params,
)
from dino_pose_tpu.train.partition import trainable_mask

# FastViT end-to-end builds/training smoke.
pytestmark = pytest.mark.slow


def test_presets_cover_reference_variants():
    for v in ("t8", "sa12", "sa24", "sa36", "ma36"):
        assert v in FASTVIT_PRESETS
    assert FASTVIT_PRESETS["t8"].out_channels == 768  # the "384 -> 768" conv
    assert FASTVIT_PRESETS["sa12"].token_mixers[-1] == "attention"
    assert FASTVIT_PRESETS["ma36"].embed_dims == (76, 152, 304, 608)


def test_tiny_pose_forward_shapes():
    model = registry.create_model_from_config(
        {"model_name": "test/fastvit-tiny", "num_keypoints": 24,
         "output_heatmap_size": 48},
        pretrained=False,
    )
    x = jnp.zeros((2, 3, 128, 128), jnp.float32)
    hm, z = model.apply(x)
    assert hm.shape == (2, 24, 48, 48)
    assert z.shape == (2, 24)
    assert model.family == "fastvit"


def test_lora_zero_init_is_identity():
    base_cfg = {"model_name": "test/fastvit-tiny", "num_keypoints": 24,
                "output_heatmap_size": 48}
    base = registry.create_model_from_config(base_cfg, pretrained=False)
    lora = registry.create_model_from_config(
        dict(base_cfg, use_lora=True, lora_rank=4, lora_dropout=0.0),
        pretrained=False,
    )
    # Copy all shared params from base into the LoRA tree.
    flat_b = traverse_util.flatten_dict(base.variables["params"])
    flat_l = dict(traverse_util.flatten_dict(lora.variables["params"]))
    for k, v in flat_b.items():
        flat_l[k] = v
    lora.variables = {
        "params": traverse_util.unflatten_dict(flat_l),
        "batch_stats": base.variables["batch_stats"],
    }
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3, 128, 128)), jnp.float32
    )
    hb, zb = base.apply(x)
    hl, zl = lora.apply(x)
    np.testing.assert_allclose(np.asarray(hb), np.asarray(hl), atol=1e-6)
    np.testing.assert_allclose(np.asarray(zb), np.asarray(zl), atol=1e-6)


def test_trainable_masks():
    base = registry.create_model_from_config(
        {"model_name": "test/fastvit-tiny", "num_keypoints": 24,
         "output_heatmap_size": 48},
        pretrained=False,
    )
    mask = traverse_util.flatten_dict(
        trainable_mask(base.variables["params"], base.config_model, "fastvit")
    )
    assert all(v == ("pose_heads" in p) for p, v in mask.items())

    lora = registry.create_model_from_config(
        {"model_name": "test/fastvit-tiny", "num_keypoints": 24,
         "output_heatmap_size": 48, "use_lora": True},
        pretrained=False,
    )
    lmask = traverse_util.flatten_dict(
        trainable_mask(lora.variables["params"], lora.config_model, "fastvit")
    )
    lora_paths = [p for p, v in lmask.items() if v and "pose_heads" not in p]
    assert lora_paths, "LoRA adapters must be trainable"
    assert all(("lora_A" in p or "lora_B" in p) for p in lora_paths)
    # every ConvFFN in every stage carries adapters (reference applies LoRA
    # to mlp.fc1/fc2 of every block, lora.py:124-149)
    n_blocks = sum(FASTVIT_PRESETS["test-tiny"].depths)
    assert len(lora_paths) == n_blocks * 2 * 2  # fc1+fc2, A+B


def test_mobileone_branch_fusion():
    """Train-form multi-branch block == fused single conv in eval mode."""
    block = MobileOneBlock(features=8, kernel_size=3, strides=1, groups=1,
                           use_act=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 8)), jnp.float32)
    variables = block.init(jax.random.key(0), x, train=False)

    # Randomise BN stats so fusion is non-trivial.
    def randomise(tree):
        return jax.tree.map(
            lambda v: jnp.asarray(
                rng.uniform(0.5, 1.5, v.shape), jnp.float32
            ),
            tree,
        )

    variables = {
        "params": randomise(variables["params"]),
        "batch_stats": randomise(variables["batch_stats"]),
    }
    want = block.apply(variables, x, train=False)

    p, s = variables["params"], variables["batch_stats"]

    def bn(name):
        return {
            "scale": p[name]["scale"], "bias": p[name]["bias"],
            "mean": s[name]["mean"], "var": s[name]["var"],
        }

    kernel, bias = fuse_mobileone_params(
        p["conv0"]["kernel"], bn("conv0_bn"),
        p["scale"]["kernel"], bn("scale_bn"),
        bn("skip_bn"),
    )
    got = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("variant", ["t8"])
def test_real_variant_forward(variant):
    """The production T8 builds and runs (reduced input for CPU test time)."""
    cfg = FASTVIT_PRESETS[variant]
    from dino_pose_tpu.models.fastvit import FastViTBackbone

    model = FastViTBackbone(cfg)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 4, 4, cfg.out_channels)
