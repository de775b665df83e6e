"""FastViT pose models (timm-compatible backbone re-implemented in Flax).

Placeholder: implemented in the FastViT milestone (SURVEY.md §7 step 8).
"""

from __future__ import annotations

import jax

from dino_pose_tpu.models.pose import PoseModel


def create_fastvit_pose(
    name: str, variant: str, config: dict, rng: jax.Array, pretrained: bool
) -> PoseModel:
    raise NotImplementedError(
        "FastViT backbones are not implemented yet in this build; "
        "use the dinov2 family."
    )
