"""Parameter/state sharding rules for the ('data', 'model') mesh.

Rules are (regex over the '/'-joined tree path) -> PartitionSpec. The same
rules shard the optimizer state for free: Adam's mu/nu subtrees carry the same
trailing path segments as their parameters, so a suffix-matching regex hits
both. Any rule whose spec does not divide the leaf shape falls back to
replication (keeps tiny models and CPU dry runs valid on any mesh).

Tensor-parallel layout for the ViT (Megatron-style, collectives over ICI):
q/k/v and fc1 shard their output features over 'model' (head-parallel
attention), the attention out-projection and fc2 shard their input features,
so each block needs a single all-reduce per residual branch — inserted by XLA
from these shardings; there is no hand-written communication code.

FastViT tensor parallelism shards only its matmul-shaped parameters: the
ConvFFN 1x1 convs (fc1 output channels / fc2 input channels — pointwise, so
no halo exchange) and the attention-stage qkv/proj Dense layers. Everything
spatial — depthwise 3x3/7x7 branches, MobileOne stems, RepCPE, SE — stays
replicated: those channel counts (8-1216) tile poorly over 'model' and a
7x7 depthwise shard would need halo exchanges that cost more than the
FLOPs they save. The ConvFFN carries most of FastViT's matmul FLOPs
(mlp_ratio 3-4x at every stage), so this covers the MXU-bound fraction
while the replicated spatial convs ride the 'data' axis. DP-only remains
the recommended deployment below ~300M params (ma36 at ~44M fits one
chip's HBM comfortably); the rules exist for capability parity and for
activation-memory relief at large batch.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (pattern, spec) — first match wins. Patterns match the joined path suffix.
VIT_TP_RULES: list[tuple[str, P]] = [
    # Anchored to encoder blocks (layer<i>/...): the pose heads' own
    # fc1/fc2 Dense layers (pose_heads/z_head/fc{0,1,2}) must stay
    # replicated — Megatron-sharding the trainable head would put per-step
    # collectives in the hottest gradient path for no memory win.
    (r"layer\d+/attention/(query|key|value)/kernel$", P(None, "model")),
    (r"layer\d+/attention/(query|key|value)/bias$", P("model")),
    (r"layer\d+/attention/out/kernel$", P("model", None)),
    (r"layer\d+/fc1/kernel$", P(None, "model")),
    (r"layer\d+/fc1/bias$", P("model")),
    (r"layer\d+/fc2/kernel$", P("model", None)),
]

# FastViT: 1x1 convs are matmuls with (1, 1, in, out) kernels — Megatron
# column/row sharding lands on the trailing channel dims. Attention stages
# use packed-qkv Dense layers. Depthwise/spatial convs fall through to
# replication (see module docstring).
FASTVIT_TP_RULES: list[tuple[str, P]] = [
    (r"mlp/fc1/kernel$", P(None, None, None, "model")),
    (r"mlp/fc1/bias$", P("model")),
    (r"mlp/fc2/kernel$", P(None, None, "model", None)),
    (r"attn/qkv/kernel$", P(None, "model")),
    (r"attn/proj/kernel$", P("model", None)),
]

_FAMILY_RULES: dict[str, list[tuple[str, P]]] = {
    "dinov2": VIT_TP_RULES,
    "fastvit": FASTVIT_TP_RULES,
}


def tp_rules_for_family(family: str) -> list[tuple[str, P]]:
    """Tensor-parallel rule table for a model family ('' spec = replicate)."""
    return _FAMILY_RULES.get(family, [])


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_fits(spec: P, shape: tuple[int, ...], mesh: Mesh) -> bool:
    if len(spec) > len(shape):
        return False
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else axis
        size = 1
        for a in axes:
            if a not in mesh.shape:
                # Rule names an axis this mesh doesn't have (e.g. 'model'
                # on a data-only eval mesh) -> replicate, per the module
                # docstring's any-mesh fallback promise.
                return False
            size *= mesh.shape[a]
        if dim % size != 0:
            return False
    return True


def tree_shardings(
    tree: Any, mesh: Mesh, rules: list[tuple[str, P]] | None = None
) -> Any:
    """NamedSharding pytree for ``tree`` (params, opt state, or full state)."""
    rules = VIT_TP_RULES if rules is None else rules
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def decide(path, leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        s = _path_str(path)
        for pat, spec in compiled:
            if pat.search(s) and _spec_fits(spec, leaf.shape, mesh):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(decide, tree)
