"""FastViT pose models: FastViT backbone -> spatial-aware pose heads.

Mirrors /root/reference/model/fastvit_pose.py: the backbone's final-conv
feature map (2 * dims[-1] channels at stride 32) feeds
``SpatialAwarePoseHeads`` — heatmaps from the spatial map, z from its global
average pool (the reference's ``_extract_both_features`` contract,
fastvit_pose.py:68-85). The reference constructs the heads with
``spatial_input_size=14`` regardless of the true stride-32 grid
(fastvit_pose.py:27) — reproduced so the upsampling-stage structure (and
therefore the exported state-dict schema) matches; the heads' trailing
bilinear resize guarantees exact ``heatmap_size`` output either way.

LoRA variant (fastvit_pose.py:100-148): backbone fully frozen, ConvLoRA
adapters on every ConvFFN fc1/fc2; freezing is the trainer's optimizer mask.
"""

from __future__ import annotations

import dataclasses
import warnings

import flax.linen as nn
import jax
import jax.numpy as jnp

from dino_pose_tpu.models.fastvit import FASTVIT_PRESETS, FastViTBackbone, FastViTConfig
from dino_pose_tpu.models.heads import SpatialAwarePoseHeads
from dino_pose_tpu.models.pose import PoseModel

Array = jax.Array

# The reference passes this constant to the heads for FastViT
# (fastvit_pose.py:27) even though the stride-32 map of a 256 input is 8x8.
_REFERENCE_SPATIAL_INPUT_SIZE = 14


class FastVitPoseModule(nn.Module):
    cfg: FastViTConfig
    num_keypoints: int = 24
    heatmap_size: int = 48

    @nn.compact
    def __call__(self, pixel_values: Array, *, train: bool = False):
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NCHW -> NHWC
        fmap = FastViTBackbone(self.cfg, name="backbone")(x, train=train)
        heatmaps, z = SpatialAwarePoseHeads(
            num_keypoints=self.num_keypoints,
            heatmap_size=self.heatmap_size,
            spatial_input_size=_REFERENCE_SPATIAL_INPUT_SIZE,
            z_hidden_dims=(1024, 512, 256),
            z_dropout_rate=0.1,
            name="pose_heads",
        )(fmap, train=train)
        return jnp.transpose(heatmaps, (0, 3, 1, 2)), z


def create_fastvit_pose(
    name: str, variant: str, config: dict, rng: jax.Array, pretrained: bool
) -> PoseModel:
    preset = FASTVIT_PRESETS[variant]
    use_lora = bool(config.get("use_lora", False))
    cfg = dataclasses.replace(
        preset,
        lora_rank=int(config.get("lora_rank", 8)) if use_lora else 0,
        lora_alpha=float(config.get("lora_alpha", 16)),
        lora_dropout=float(config.get("lora_dropout", 0.1)),
    )
    module = FastVitPoseModule(
        cfg=cfg,
        num_keypoints=int(config.get("num_keypoints", 24)),
        heatmap_size=int(config.get("output_heatmap_size", 48)),
    )
    # timm FastViT default input resolution (resolve_data_config input_size).
    input_size = int(config.get("input_size", 256))
    variables = module.init(
        rng, jnp.zeros((1, 3, input_size, input_size), jnp.float32)
    )
    variables = jax.tree.map(lambda v: jax.device_get(v), variables)

    if pretrained and not name.startswith("test/"):
        warnings.warn(
            f"Pre-trained timm weights for {name} are not available in this "
            "environment; initialising the FastViT backbone randomly. Provide "
            "a checkpoint via config_model['load_model'] for real training.",
            stacklevel=2,
        )

    return PoseModel(
        module=module,
        variables=variables,
        model_name=name,
        family="fastvit",
        config_model=dict(config),
        input_size=input_size,
    )
