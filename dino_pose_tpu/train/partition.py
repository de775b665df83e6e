"""Parameter partitioning: which weights train, which stay frozen.

The reference expresses freezing through ``requires_grad`` flags
(/root/reference/model/dinov2_pose.py:20-39, fastvit_pose.py:38-41,122-124);
here it is a boolean pytree used to *split* the parameter tree: the optimizer
sees only the trainable subtree (gradients, optimizer state and weight decay
never touch frozen params — and the backward graph stops at the deepest
trainable parameter), and the frozen subtree is merged back after each update.
"""

from __future__ import annotations

import re

from flax import traverse_util


def trainable_mask(params: dict, config_model: dict, family: str) -> dict:
    """Boolean pytree: True where the parameter receives gradient updates.

    dinov2 standard: pose heads + the last ``unfreeze_last_n_layers`` encoder
    blocks (their attention/MLP/norm/LayerScale params — a superset of the
    reference's block+norm unfreeze, which is itself block params + norms).
    dinov2 LoRA: pose heads + LoRA adapter matrices only.
    fastvit standard: pose heads only. fastvit LoRA: pose heads + LoRA.
    """
    use_lora = bool(config_model.get("use_lora", False))
    unfreeze_n = int(config_model.get("unfreeze_last_n_layers", 0) or 0)
    if family != "dinov2":
        # Unfreeze-last-N is a dinov2 feature (reference dinov2_pose.py
        # semantics); other families train heads (+ LoRA) only. Guarded by
        # family rather than by tree shape so a future backbone with
        # layer<N>-named submodules cannot silently start unfreezing.
        unfreeze_n = 0
    flat = traverse_util.flatten_dict(params)

    num_layers = 0
    for path in flat:
        for part in path:
            m = re.fullmatch(r"layer(\d+)", part)
            if m:
                num_layers = max(num_layers, int(m.group(1)) + 1)

    def decide(path: tuple[str, ...]) -> bool:
        if "pose_heads" in path or (path and path[0] == "head"):
            return True
        if use_lora:
            return "lora_output" in path or any(
                p in ("lora_A", "lora_B") for p in path
            )
        if unfreeze_n > 0:
            for part in path:
                m = re.fullmatch(r"layer(\d+)", part)
                if m and int(m.group(1)) >= num_layers - unfreeze_n:
                    return True
        return False

    return traverse_util.unflatten_dict({p: decide(p) for p in flat})
