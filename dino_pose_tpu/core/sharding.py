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

FastViT deliberately has NO tensor-parallel rules — all its parameters fall
through to replication. Decision: the largest production variant (ma36,
~44M params, /root/reference/model/model_utils.py registry) fits one chip's
HBM with room for bs=128 activations; its compute is dominated by spatial
convolutions whose per-layer channel counts (48-1216) shard poorly over
'model' (uneven tiles, halo exchanges for 7x7 depthwise kernels), and the
arithmetic intensity lost to the extra collectives exceeds any memory win.
FastViT scales over the 'data' axis only; revisit if a >300M-param conv
backbone is ever registered.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (pattern, spec) — first match wins. Patterns match the joined path suffix.
VIT_TP_RULES: list[tuple[str, P]] = [
    (r"attention/(query|key|value)/kernel$", P(None, "model")),
    (r"attention/(query|key|value)/bias$", P("model")),
    (r"attention/out/kernel$", P("model", None)),
    (r"fc1/kernel$", P(None, "model")),
    (r"fc1/bias$", P("model")),
    (r"fc2/kernel$", P("model", None)),
]


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
