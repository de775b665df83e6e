"""Lossless weight bridge between this framework and the reference's PyTorch
state-dict schema.

Checkpoints exported through this module reproduce the exact key names and
tensor layouts of the reference models (e.g.
``backbone.encoder.layer.11.attention.original_attention.attention.query.weight``,
``pose_heads.heatmap_head.feature_refine.0.weight`` — see
/root/reference/model/model_utils.py:227-283 and the key-based family detection
in /root/reference/export_coreml.py:16-165), so the reference's CoreML export
path consumes them unchanged. Importing goes the other way, e.g. to initialise
the backbone from pre-trained HF DINOv2 weights.

Layout transforms applied per parameter kind:

==========  ==========================  ==============================
kind        torch layout                flax layout (this framework)
==========  ==========================  ==============================
linear      (out, in)                   (in, out)
conv        (out, in/g, kh, kw)         (kh, kw, in/g, out)   [HWIO]
convT       (in, out, kh, kw)           (kh, kw, in, out), spatially
                                        flipped (equivalent-conv form)
none        identical                   identical
==========  ==========================  ==============================
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

import numpy as np
from flax import traverse_util


@dataclasses.dataclass(frozen=True)
class Rule:
    """One parameter correspondence: flax path <-> torch key."""

    flax_path: tuple[str, ...]
    torch_key: str
    kind: str = "none"  # linear | conv | convT | none


def _to_flax(w: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return np.ascontiguousarray(w.T)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
    if kind == "convT":
        return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])
    return np.asarray(w)


def _to_torch(w: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return np.ascontiguousarray(w.T)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
    if kind == "convT":
        return np.ascontiguousarray(np.transpose(w[::-1, ::-1], (2, 3, 0, 1)))
    return np.asarray(w)


# ---------------------------------------------------------------------------
# Rule builders
# ---------------------------------------------------------------------------

def vit_rules(
    num_layers: int,
    lora_layers: Iterable[int] = (),
    torch_prefix: str = "",
) -> list[Rule]:
    """Mapping for the DINOv2 backbone vs HF ``Dinov2Model`` state dicts.

    ``lora_layers`` are the encoder layers the reference wraps in
    ``LoRAAttention`` — their original attention weights move under
    ``attention.original_attention`` and gain ``attention.lora_output`` params
    (/root/reference/model/dinov2_pose.py:197-204, model/lora.py:31-65).
    """
    lora_layers = set(lora_layers)
    p = torch_prefix
    rules = [
        Rule(("cls_token",), f"{p}embeddings.cls_token"),
        Rule(("mask_token",), f"{p}embeddings.mask_token"),
        Rule(("pos_embed",), f"{p}embeddings.position_embeddings"),
        Rule(("patch_embed", "kernel"), f"{p}embeddings.patch_embeddings.projection.weight", "conv"),
        Rule(("patch_embed", "bias"), f"{p}embeddings.patch_embeddings.projection.bias"),
        Rule(("layernorm", "scale"), f"{p}layernorm.weight"),
        Rule(("layernorm", "bias"), f"{p}layernorm.bias"),
    ]
    for i in range(num_layers):
        fl = (f"layer{i}",)
        tl = f"{p}encoder.layer.{i}."
        attn = f"{tl}attention."
        if i in lora_layers:
            attn = f"{tl}attention.original_attention."
            rules += [
                Rule(fl + ("attention", "lora_output", "lora_A"), f"{tl}attention.lora_output.lora_A"),
                Rule(fl + ("attention", "lora_output", "lora_B"), f"{tl}attention.lora_output.lora_B"),
            ]
        for nm in ("query", "key", "value"):
            rules += [
                Rule(fl + ("attention", nm, "kernel"), f"{attn}attention.{nm}.weight", "linear"),
                Rule(fl + ("attention", nm, "bias"), f"{attn}attention.{nm}.bias"),
            ]
        rules += [
            Rule(fl + ("attention", "out", "kernel"), f"{attn}output.dense.weight", "linear"),
            Rule(fl + ("attention", "out", "bias"), f"{attn}output.dense.bias"),
            Rule(fl + ("norm1", "scale"), f"{tl}norm1.weight"),
            Rule(fl + ("norm1", "bias"), f"{tl}norm1.bias"),
            Rule(fl + ("norm2", "scale"), f"{tl}norm2.weight"),
            Rule(fl + ("norm2", "bias"), f"{tl}norm2.bias"),
            Rule(fl + ("layerscale1",), f"{tl}layer_scale1.lambda1"),
            Rule(fl + ("layerscale2",), f"{tl}layer_scale2.lambda1"),
            Rule(fl + ("fc1", "kernel"), f"{tl}mlp.fc1.weight", "linear"),
            Rule(fl + ("fc1", "bias"), f"{tl}mlp.fc1.bias"),
            Rule(fl + ("fc2", "kernel"), f"{tl}mlp.fc2.weight", "linear"),
            Rule(fl + ("fc2", "bias"), f"{tl}mlp.fc2.bias"),
        ]
    return rules


# ---------------------------------------------------------------------------
# Apply rules
# ---------------------------------------------------------------------------

def import_params(
    params: dict,
    torch_state: dict[str, np.ndarray],
    rules: list[Rule],
    *,
    strict: bool = True,
) -> dict:
    """Return a copy of ``params`` with values taken from ``torch_state``."""
    flat = dict(traverse_util.flatten_dict(params))
    missing = []
    for rule in rules:
        if rule.torch_key not in torch_state:
            missing.append(rule.torch_key)
            continue
        w = _to_flax(np.asarray(torch_state[rule.torch_key]), rule.kind)
        if rule.flax_path not in flat:
            raise KeyError(f"Param tree missing {rule.flax_path} (for {rule.torch_key})")
        expect = flat[rule.flax_path].shape
        if tuple(w.shape) != tuple(expect):
            raise ValueError(
                f"Shape mismatch for {rule.torch_key}: torch->{w.shape}, flax expects {expect}"
            )
        flat[rule.flax_path] = w.astype(np.asarray(flat[rule.flax_path]).dtype)
    if strict and missing:
        raise KeyError(f"torch state dict missing keys: {missing[:10]}{'...' if len(missing) > 10 else ''}")
    return traverse_util.unflatten_dict(flat)


def export_params(params: dict, rules: list[Rule]) -> dict[str, np.ndarray]:
    """Render the flax param tree into a torch-layout state dict."""
    flat = dict(traverse_util.flatten_dict(params))
    out = {}
    for rule in rules:
        if rule.flax_path not in flat:
            raise KeyError(f"Param tree missing {rule.flax_path}")
        out[rule.torch_key] = _to_torch(np.asarray(flat[rule.flax_path]), rule.kind)
    return out
