"""Backbone registry and model factory.

Mirrors the reference registry surface (/root/reference/model/model_utils.py:
10-225): the same seven production backbones, family aliases, per-backbone
default configs, and a ``create_model_from_config`` factory driven by the
``config_model`` dict. LoRA selection happens through ``use_lora`` exactly as
in the reference — except here "model class" means a Flax module configuration,
not a subclass.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any

import jax
import jax.numpy as jnp

from dino_pose_tpu.models.pose import DinoPoseModule, PoseModel
from dino_pose_tpu.models.vit import VIT_PRESETS


@dataclasses.dataclass
class BackboneEntry:
    family: str
    default_config: dict
    # Extra builder metadata (e.g. fastvit variant name).
    variant: str = ""


_DINO_DEFAULT = {
    "num_keypoints": 24,
    "output_heatmap_size": 48,
    "use_lora": False,
    "unfreeze_last_n_layers": 0,
}
_FASTVIT_DEFAULT = {
    "num_keypoints": 24,
    "output_heatmap_size": 48,
    "use_lora": False,
}

BACKBONE_REGISTRY: dict[str, BackboneEntry] = {
    "facebook/dinov2-small": BackboneEntry("dinov2", dict(_DINO_DEFAULT)),
    "facebook/dinov2-base": BackboneEntry("dinov2", dict(_DINO_DEFAULT)),
    "facebook/dinov2-large": BackboneEntry("dinov2", dict(_DINO_DEFAULT)),
    "timm/fastvit_t8.apple_in1k": BackboneEntry("fastvit", dict(_FASTVIT_DEFAULT), "t8"),
    "timm/fastvit_ma36.apple_in1k": BackboneEntry("fastvit", dict(_FASTVIT_DEFAULT), "ma36"),
    "timm/fastvit_sa12.apple_in1k": BackboneEntry("fastvit", dict(_FASTVIT_DEFAULT), "sa12"),
    "timm/fastvit_sa24.apple_in1k": BackboneEntry("fastvit", dict(_FASTVIT_DEFAULT), "sa24"),
    "timm/fastvit_sa36.apple_in1k": BackboneEntry("fastvit", dict(_FASTVIT_DEFAULT), "sa36"),
    # Tiny backbones for tests and the multi-chip dry run.
    "test/vit-tiny": BackboneEntry("dinov2", dict(_DINO_DEFAULT)),
    # input 128 -> 4x4 stride-32 map, the smallest the hourglass heads accept.
    "test/fastvit-tiny": BackboneEntry(
        "fastvit", dict(_FASTVIT_DEFAULT, input_size=128), "test-tiny"
    ),
}

FAMILY_DEFAULTS: dict[str, str] = {
    "dinov2": "facebook/dinov2-small",
    "fastvit": "timm/fastvit_t8.apple_in1k",
}

FAMILY_INFO: dict[str, dict] = {
    "dinov2": {
        "description": "Vision Transformer with self-supervised learning",
        "features": [
            "Self-supervised pre-training",
            "Strong feature representations",
            "LoRA support",
        ],
        "available_sizes": ["small (21M)", "base (86M)", "large (300M)"],
        "default": "facebook/dinov2-small",
    },
    "fastvit": {
        "description": "FastViT: A Fast Hybrid Vision Transformer using Structural Reparameterization",
        "features": ["Fast inference", "Hybrid architecture", "Mobile-optimized"],
        "available_sizes": [
            "t8 (4M)",
            "sa12 (9M)",
            "sa24 (22M)",
            "sa36 (31M)",
            "ma36 (44M)",
        ],
        "default": "timm/fastvit_t8.apple_in1k",
    },
}


def register_backbone(
    model_name: str, family: str, default_config: dict | None = None, variant: str = ""
) -> None:
    BACKBONE_REGISTRY[model_name] = BackboneEntry(
        family=family, default_config=default_config or {}, variant=variant
    )


def register_family_default(family_name: str, default_model_name: str) -> None:
    FAMILY_DEFAULTS[family_name] = default_model_name


def resolve_model_name(model_name_or_family: str) -> str:
    if model_name_or_family in BACKBONE_REGISTRY:
        return model_name_or_family
    if model_name_or_family in FAMILY_DEFAULTS:
        return FAMILY_DEFAULTS[model_name_or_family]
    return model_name_or_family


def is_supported_backbone(model_name: str) -> bool:
    return model_name in BACKBONE_REGISTRY


def is_family_name(name: str) -> bool:
    return name in FAMILY_DEFAULTS


def get_family_models(family_name: str) -> dict[str, BackboneEntry]:
    return {
        name: entry
        for name, entry in BACKBONE_REGISTRY.items()
        if entry.family == family_name
    }


def list_families() -> dict[str, dict]:
    return {
        family: {
            "info": FAMILY_INFO.get(family, {}),
            "default": default,
            "models": list(get_family_models(family)),
        }
        for family, default in FAMILY_DEFAULTS.items()
    }


def list_supported_backbones() -> dict[str, BackboneEntry]:
    return dict(BACKBONE_REGISTRY)


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------

def _load_pretrained_dinov2(model_name: str) -> dict | None:
    """Fetch HF DINOv2 weights from the local cache only (offline-safe)."""
    try:
        from transformers import Dinov2Model

        torch_model = Dinov2Model.from_pretrained(model_name, local_files_only=True)
        return {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    except Exception as e:  # noqa: BLE001 — any hub/cache failure means "no weights"
        warnings.warn(
            f"Pre-trained weights for {model_name} unavailable ({type(e).__name__}); "
            "initialising backbone randomly. Provide a checkpoint via "
            "config_model['load_model'] for real training.",
            stacklevel=2,
        )
        return None


def create_model_from_config(
    config_model: dict[str, Any],
    *,
    rng: jax.Array | None = None,
    pretrained: bool = True,
) -> PoseModel:
    """Build a :class:`PoseModel` from a ``config_model`` dict.

    Accepts registered backbone names and family aliases; LoRA is chosen via
    ``use_lora`` (reference behaviour at model_utils.py:189-225).
    """
    name = resolve_model_name(config_model["model_name"])
    if name not in BACKBONE_REGISTRY:
        raise ValueError(
            f"Unsupported backbone: {name}. Use 'model_info.py --backbones' to "
            "see supported models and families."
        )
    entry = BACKBONE_REGISTRY[name]
    merged = dict(entry.default_config)
    merged.update(config_model)
    merged["model_name"] = name

    rng = rng if rng is not None else jax.random.key(0)
    if entry.family == "dinov2":
        model = _create_dinov2(name, merged, rng, pretrained)
    elif entry.family == "fastvit":
        from dino_pose_tpu.models.fastvit_pose import create_fastvit_pose

        model = create_fastvit_pose(name, entry.variant, merged, rng, pretrained)
    else:
        raise ValueError(f"Unknown family {entry.family}")
    return _with_print(model, merged, entry)


def _with_print(model: PoseModel, merged: dict, entry: BackboneEntry) -> PoseModel:
    kind = "LoRA" if merged.get("use_lora") else "standard"
    print(f"Created {kind} model with {merged['model_name']} ({entry.family} family)")
    return model


def _create_dinov2(
    name: str, config: dict, rng: jax.Array, pretrained: bool
) -> PoseModel:
    preset = VIT_PRESETS[name]
    use_lora = bool(config.get("use_lora", False))
    vit_cfg = dataclasses.replace(
        preset,
        lora_layers=(preset.num_layers - 1,) if use_lora else (),
        lora_rank=int(config.get("lora_rank", 8)),
        lora_alpha=float(config.get("lora_alpha", 16)),
        lora_dropout=float(config.get("lora_dropout", 0.1)),
        # Which top layers train (reference unfreeze semantics,
        # dinov2_pose.py:25-39); frozen layers below are eligible for the
        # fused-forward block kernel (ops/block.py).
        num_unfrozen_layers=0 if use_lora else int(
            config.get("unfreeze_last_n_layers", 0) or 0
        ),
    )
    module = DinoPoseModule(
        vit=vit_cfg,
        num_keypoints=int(config.get("num_keypoints", 24)),
        heatmap_size=int(config.get("output_heatmap_size", 48)),
    )
    input_size = 224
    variables = module.init(
        rng, jnp.zeros((1, 3, input_size, input_size), jnp.float32)
    )
    variables = jax.tree.map(lambda x: jax.device_get(x), variables)

    if pretrained and not name.startswith("test/"):
        state = _load_pretrained_dinov2(name)
        if state is not None:
            from dino_pose_tpu.io import torch_bridge as tb

            # HF dicts use the plain (non-LoRA) key layout; LoRA adapters keep
            # their fresh initialisation (zero delta at step 0).
            variables["params"]["backbone"] = tb.import_params(
                variables["params"]["backbone"],
                state,
                tb.vit_rules(vit_cfg.num_layers),
                strict=False,
            )

    return PoseModel(
        module=module,
        variables=variables,
        model_name=name,
        family="dinov2",
        config_model=config,
        input_size=input_size,
    )
