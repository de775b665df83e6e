"""End-to-end pose models: backbone -> spatial feature map -> pose heads.

Public forward contract (matching /root/reference/model/base_pose.py:35-47):
``apply(pixel_values[B,3,H,W]) -> (heatmaps[B,K,S,S], z[B,K])``.

Internally everything is channels-last; the NCHW<->NHWC transposes happen only
at this boundary.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from dino_pose_tpu.models.heads import SpatialAwarePoseHeads
from dino_pose_tpu.models.vit import Dinov2Backbone, ViTConfig

Array = jax.Array


class DinoPoseModule(nn.Module):
    """DINOv2 backbone + spatial-aware pose heads.

    Covers both reference classes: ``Dinov2PoseModel`` (plain / unfrozen-last-N
    — freezing is a trainer concern here, expressed as an optimizer mask) and
    ``Dinov2PoseModelLoRA`` (set ``vit.lora_layers``), see
    /root/reference/model/dinov2_pose.py:10-54,176-219.
    """

    vit: ViTConfig
    num_keypoints: int = 24
    heatmap_size: int = 48

    @nn.compact
    def __call__(self, pixel_values: Array, *, train: bool = False):
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NCHW -> NHWC
        tokens, (hp, wp) = Dinov2Backbone(self.vit, name="backbone")(
            x, deterministic=not train
        )
        patch = tokens[:, 1:, :].reshape(tokens.shape[0], hp, wp, tokens.shape[-1])
        heatmaps, z = SpatialAwarePoseHeads(
            num_keypoints=self.num_keypoints,
            heatmap_size=self.heatmap_size,
            spatial_input_size=hp,
            name="pose_heads",
        )(patch, train=train)
        return jnp.transpose(heatmaps, (0, 3, 1, 2)), z


@dataclasses.dataclass
class PoseModel:
    """A bound model: module definition + variables + metadata.

    Flax modules are pure; this wrapper carries the state and mirrors the
    convenience surface of the reference's ``BasePoseModel``.
    """

    module: nn.Module
    variables: dict
    model_name: str
    family: str
    config_model: dict
    input_size: int = 224

    @property
    def num_keypoints(self) -> int:
        return int(self.config_model.get("num_keypoints", 24))

    @property
    def heatmap_size(self) -> int:
        return int(self.config_model.get("output_heatmap_size", 48))

    @property
    def use_lora(self) -> bool:
        return bool(self.config_model.get("use_lora", False))

    def apply(
        self,
        pixel_values: Array,
        *,
        train: bool = False,
        rngs: dict | None = None,
        variables: dict | None = None,
    ):
        """Forward pass. In training mode returns ``(outputs, new_batch_stats)``."""
        variables = self.variables if variables is None else variables
        if train:
            outputs, mutated = self.module.apply(
                variables,
                pixel_values,
                train=True,
                rngs=rngs or {},
                mutable=["batch_stats"],
            )
            return outputs, mutated
        return self.module.apply(variables, pixel_values, train=False)

    def __call__(self, pixel_values: Array):
        return self.apply(pixel_values)

    def count_parameters(self, trainable_only: bool = True) -> int:
        from dino_pose_tpu.train.partition import trainable_mask

        params = self.variables["params"]
        if not trainable_only:
            return sum(x.size for x in jax.tree.leaves(params))
        mask = trainable_mask(params, self.config_model, self.family)
        return sum(
            x.size
            for x, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask))
            if m
        )

    def print_trainable_parameters(self) -> None:
        from flax import traverse_util

        from dino_pose_tpu.train.partition import trainable_mask

        params = self.variables["params"]
        mask = traverse_util.flatten_dict(
            trainable_mask(params, self.config_model, self.family)
        )
        for path, value in traverse_util.flatten_dict(params).items():
            if mask[path]:
                name = ".".join(path)
                print(
                    f"Trainable: {name}, Shape: {tuple(value.shape)}, "
                    f"Parameters: {value.size:,}"
                )
