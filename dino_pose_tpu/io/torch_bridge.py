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
    kind: str = "none"  # linear | conv | convT | scale2d | none


def _to_flax(w: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return np.ascontiguousarray(w.T)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
    if kind == "convT":
        return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])
    if kind == "scale2d":  # torch LayerScale (C, 1, 1) -> flax (C,)
        return np.asarray(w).reshape(-1)
    return np.asarray(w)


def _to_torch(w: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return np.ascontiguousarray(w.T)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
    if kind == "convT":
        return np.ascontiguousarray(np.transpose(w[::-1, ::-1], (2, 3, 0, 1)))
    if kind == "scale2d":
        return np.asarray(w).reshape(-1, 1, 1)
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


def _conv_bn_rules(flax_base, torch_conv, torch_bn, *, deconv=False) -> list[Rule]:
    """Rules for a Conv(Transpose)+BatchNorm pair.

    ``flax_base`` addresses the block *module* path (without collection); BN
    running stats live in the ``batch_stats`` collection.
    """
    kind = "convT" if deconv else "conv"
    conv_name = "deconv" if deconv else "conv"
    return [
        Rule(("params",) + flax_base + (conv_name, "kernel"), f"{torch_conv}.weight", kind),
        Rule(("params",) + flax_base + (conv_name, "bias"), f"{torch_conv}.bias"),
        Rule(("params",) + flax_base + ("bn", "scale"), f"{torch_bn}.weight"),
        Rule(("params",) + flax_base + ("bn", "bias"), f"{torch_bn}.bias"),
        Rule(("batch_stats",) + flax_base + ("bn", "mean"), f"{torch_bn}.running_mean"),
        Rule(("batch_stats",) + flax_base + ("bn", "var"), f"{torch_bn}.running_var"),
    ]


def _split_conv_bn_rules(
    fpath: tuple[str, ...], fconv: str, fbn: str, tconv: str, tbn: str
) -> list[Rule]:
    """Conv+BN pair whose flax params are SIBLINGS (reparam-fold holders:
    ``<name>/kernel`` next to ``<name>_bn`` affine + running stats), mapped
    to torch ``<tconv>.weight`` / ``<tbn>.{weight,bias,running_*}``."""
    return [
        Rule(("params",) + fpath + (fconv, "kernel"), f"{tconv}.weight", "conv"),
        Rule(("params",) + fpath + (fbn, "scale"), f"{tbn}.weight"),
        Rule(("params",) + fpath + (fbn, "bias"), f"{tbn}.bias"),
        Rule(("batch_stats",) + fpath + (fbn, "mean"), f"{tbn}.running_mean"),
        Rule(("batch_stats",) + fpath + (fbn, "var"), f"{tbn}.running_var"),
    ]


def spatial_heads_rules(
    module_path: tuple[str, ...],
    torch_prefix: str,
    *,
    num_up_stages: int = 2,
    z_hidden_count: int = 3,
) -> list[Rule]:
    """Mapping for ``SpatialAwarePoseHeads`` vs the reference torch Sequential
    index naming (/root/reference/model/pose_heads.py:287-400)."""
    mp = module_path
    hm = mp + ("heatmap_head",)
    tp = torch_prefix
    thm = f"{tp}heatmap_head."
    hg = hm + ("hourglass",)
    thg = f"{thm}feature_refine.3."
    rules: list[Rule] = []
    rules += _conv_bn_rules(hm + ("refine_in",), f"{thm}feature_refine.0", f"{thm}feature_refine.1")
    rules += _conv_bn_rules(hg + ("dw",), f"{thg}depthwise_conv.0", f"{thg}depthwise_conv.1")
    rules += _conv_bn_rules(hg + ("pw",), f"{thg}depthwise_conv.3", f"{thg}depthwise_conv.4")
    rules += _conv_bn_rules(hg + ("down1",), f"{thg}down1.0", f"{thg}down1.1")
    rules += _conv_bn_rules(hg + ("down2",), f"{thg}down2.0", f"{thg}down2.1")
    rules += _conv_bn_rules(hg + ("btl1",), f"{thg}bottleneck.0", f"{thg}bottleneck.1")
    rules += [
        Rule(("params",) + hg + ("btl2_conv", "kernel"), f"{thg}bottleneck.3.weight", "conv"),
        Rule(("params",) + hg + ("btl2_conv", "bias"), f"{thg}bottleneck.3.bias"),
        Rule(("params",) + hg + ("btl2_bn", "scale"), f"{thg}bottleneck.4.weight"),
        Rule(("params",) + hg + ("btl2_bn", "bias"), f"{thg}bottleneck.4.bias"),
        Rule(("batch_stats",) + hg + ("btl2_bn", "mean"), f"{thg}bottleneck.4.running_mean"),
        Rule(("batch_stats",) + hg + ("btl2_bn", "var"), f"{thg}bottleneck.4.running_var"),
    ]
    rules += _conv_bn_rules(hg + ("up1",), f"{thg}up1.0", f"{thg}up1.1", deconv=True)
    rules += _conv_bn_rules(hg + ("up2",), f"{thg}up2.0", f"{thg}up2.1", deconv=True)
    rules += _conv_bn_rules(hg + ("skip",), f"{thg}skip.0", f"{thg}skip.1")
    rules += _conv_bn_rules(hm + ("refine_out",), f"{thm}feature_refine.4", f"{thm}feature_refine.5")
    for j in range(num_up_stages):
        rules += _conv_bn_rules(
            hm + (f"up{j}",), f"{thm}upsampling.{j}.0", f"{thm}upsampling.{j}.1", deconv=True
        )
    rules += _conv_bn_rules(hm + ("pred_conv",), f"{thm}prediction.0", f"{thm}prediction.1")
    rules += [
        Rule(("params",) + hm + ("pred_out", "kernel"), f"{thm}prediction.3.weight", "conv"),
        Rule(("params",) + hm + ("pred_out", "bias"), f"{thm}prediction.3.bias"),
    ]
    z = mp + ("z_head",)
    tz = f"{tp}z_head.mlp."
    for j in range(z_hidden_count):
        rules += [
            Rule(("params",) + z + (f"fc{j}", "kernel"), f"{tz}{3 * j}.weight", "linear"),
            Rule(("params",) + z + (f"fc{j}", "bias"), f"{tz}{3 * j}.bias"),
        ]
    rules += [
        Rule(("params",) + z + ("out", "kernel"), f"{tz}{3 * z_hidden_count}.weight", "linear"),
        Rule(("params",) + z + ("out", "bias"), f"{tz}{3 * z_hidden_count}.bias"),
    ]
    return rules


def dinov2_pose_rules(
    num_layers: int, lora_layers: Iterable[int] = (), num_up_stages: int = 2
) -> list[Rule]:
    """Full-variable-tree mapping for ``DinoPoseModule`` checkpoints.

    torch keys carry the reference prefixes: ``backbone.*`` for the ViT,
    ``pose_heads.*`` for the heads (/root/reference/model/dinov2_pose.py:13,45).
    """
    rules = [
        Rule(("params", "backbone") + r.flax_path, f"backbone.{r.torch_key}", r.kind)
        for r in vit_rules(num_layers, lora_layers)
    ]
    rules += spatial_heads_rules(
        ("pose_heads",), "pose_heads.", num_up_stages=num_up_stages
    )
    return rules


def _bn_module_rules(flax_bn: tuple[str, ...], torch_bn: str) -> list[Rule]:
    """A standalone torch BatchNorm2d module (not inside a Sequential)."""
    return [
        Rule(("params",) + flax_bn + ("scale",), f"{torch_bn}.weight"),
        Rule(("params",) + flax_bn + ("bias",), f"{torch_bn}.bias"),
        Rule(("batch_stats",) + flax_bn + ("mean",), f"{torch_bn}.running_mean"),
        Rule(("batch_stats",) + flax_bn + ("var",), f"{torch_bn}.running_var"),
    ]


def mobileone_rules(
    fpath: tuple[str, ...],
    tprefix: str,
    *,
    kernel: int = 3,
    identity: bool = True,
    num_branches: int = 1,
    use_se: bool = False,
) -> list[Rule]:
    """MobileOneBlock mapping (flax names conv{b}/conv{b}_bn/scale/scale_bn/
    skip_bn/se <-> torch rbr_conv.{b}/rbr_scale/rbr_skip/se)."""
    rules: list[Rule] = []
    for b in range(num_branches):
        rules += _split_conv_bn_rules(
            fpath, f"conv{b}", f"conv{b}_bn",
            f"{tprefix}rbr_conv.{b}.conv", f"{tprefix}rbr_conv.{b}.bn",
        )
    if kernel > 1:
        rules += _split_conv_bn_rules(
            fpath, "scale", "scale_bn",
            f"{tprefix}rbr_scale.conv", f"{tprefix}rbr_scale.bn",
        )
    if identity:
        rules += _bn_module_rules(fpath + ("skip_bn",), f"{tprefix}rbr_skip")
    if use_se:
        rules += [
            Rule(("params",) + fpath + ("se", "reduce", "kernel"),
                 f"{tprefix}se.reduce.weight", "conv"),
            Rule(("params",) + fpath + ("se", "reduce", "bias"),
                 f"{tprefix}se.reduce.bias"),
            Rule(("params",) + fpath + ("se", "expand", "kernel"),
                 f"{tprefix}se.expand.weight", "conv"),
            Rule(("params",) + fpath + ("se", "expand", "bias"),
                 f"{tprefix}se.expand.bias"),
        ]
    return rules


def _large_kernel_rules(fpath: tuple[str, ...], tprefix: str) -> list[Rule]:
    """ReparamLargeKernelConv: lkb_origin (7x7) + small_conv branches."""
    rules = []
    for fname, tname in (("large", "lkb_origin"), ("small", "small_conv")):
        rules += _split_conv_bn_rules(
            fpath, fname, f"{fname}_bn",
            f"{tprefix}{tname}.conv", f"{tprefix}{tname}.bn",
        )
    return rules


def fastvit_backbone_rules(cfg, base: tuple[str, ...] = ("backbone",),
                           torch_prefix: str = "backbone.") -> list[Rule]:
    """Mapping for the FastViT backbone vs the official (apple/ml-fastvit,
    mirrored by timm) state-dict naming: ``stem.{i}``, ``stages.{i}`` with
    ``downsample.proj.{0,1}`` / ``pos_emb`` / ``blocks.{j}``, ``final_conv``.

    The reference's consumers rely on exactly these containers: family
    detection greps for 'backbone.stages' (/root/reference/export_coreml.py:114),
    the LoRA wrapper walks model.stages[i].blocks[j].mlp.fc{1,2}
    (/root/reference/model/lora.py:130-149), and LoRA keys land at
    ``...mlp.fc1.{original_conv,lora_A,lora_B}.weight``.
    """
    p = torch_prefix
    lora = cfg.lora_rank > 0
    rules: list[Rule] = []
    d0_id = True  # stem blocks 1,2 keep in==out
    rules += mobileone_rules(base + ("stem0",), f"{p}stem.0.", identity=False)
    rules += mobileone_rules(base + ("stem1",), f"{p}stem.1.", identity=False)
    rules += mobileone_rules(base + ("stem2",), f"{p}stem.2.", kernel=1, identity=d0_id)

    for i in range(len(cfg.embed_dims)):
        sp = f"{p}stages.{i}."
        if i > 0:
            rules += _large_kernel_rules(
                base + (f"downsample{i}", "proj"), f"{sp}downsample.proj.0."
            )
            rules += mobileone_rules(
                base + (f"downsample{i}", "mix"), f"{sp}downsample.proj.1.",
                kernel=1, identity=True,
            )
        if cfg.pos_embs[i]:
            rules += [
                Rule(("params", *base, f"pos_emb{i}", "pe", "kernel"),
                     f"{sp}pos_emb.pe.weight", "conv"),
                Rule(("params", *base, f"pos_emb{i}", "pe", "bias"),
                     f"{sp}pos_emb.pe.bias"),
            ]
        for j in range(cfg.depths[i]):
            bp = base + (f"stage{i}_block{j}",)
            tb = f"{sp}blocks.{j}."
            if cfg.token_mixers[i] == "repmixer":
                rules += mobileone_rules(
                    bp + ("token_mixer", "mixer"), f"{tb}token_mixer.mixer.",
                    identity=True,
                )
                rules += _bn_module_rules(
                    bp + ("token_mixer", "norm", "skip_bn"),
                    f"{tb}token_mixer.norm.rbr_skip",
                )
                rules += [
                    Rule(("params",) + bp + ("token_mixer", "layer_scale"),
                         f"{tb}token_mixer.layer_scale", "scale2d"),
                ]
            else:
                rules += _bn_module_rules(bp + ("attn", "norm"), f"{tb}norm")
                rules += [
                    Rule(("params",) + bp + ("attn", "qkv", "kernel"),
                         f"{tb}token_mixer.qkv.weight", "linear"),
                    Rule(("params",) + bp + ("attn", "proj", "kernel"),
                         f"{tb}token_mixer.proj.weight", "linear"),
                    Rule(("params",) + bp + ("attn", "proj", "bias"),
                         f"{tb}token_mixer.proj.bias"),
                    Rule(("params",) + bp + ("layer_scale_1",),
                         f"{tb}layer_scale_1", "scale2d"),
                ]
            # ConvFFN
            fc1 = f"{tb}mlp.fc1." if not lora else f"{tb}mlp.fc1.original_conv."
            fc2 = f"{tb}mlp.fc2." if not lora else f"{tb}mlp.fc2.original_conv."
            rules += _split_conv_bn_rules(
                bp + ("mlp",), "conv", "conv_bn",
                f"{tb}mlp.conv.conv", f"{tb}mlp.conv.bn",
            )
            rules += [
                Rule(("params",) + bp + ("mlp", "fc1", "kernel"), f"{fc1}weight", "conv"),
                Rule(("params",) + bp + ("mlp", "fc1", "bias"), f"{fc1}bias"),
                Rule(("params",) + bp + ("mlp", "fc2", "kernel"), f"{fc2}weight", "conv"),
                Rule(("params",) + bp + ("mlp", "fc2", "bias"), f"{fc2}bias"),
                Rule(("params",) + bp + ("layer_scale_2",),
                     f"{tb}layer_scale" if cfg.token_mixers[i] == "repmixer"
                     else f"{tb}layer_scale_2", "scale2d"),
            ]
            if lora:
                for fc in ("fc1", "fc2"):
                    rules += [
                        Rule(("params",) + bp + ("mlp", f"{fc}_lora", "lora_A", "kernel"),
                             f"{tb}mlp.{fc}.lora_A.weight", "conv"),
                        Rule(("params",) + bp + ("mlp", f"{fc}_lora", "lora_B", "kernel"),
                             f"{tb}mlp.{fc}.lora_B.weight", "conv"),
                    ]

    rules += mobileone_rules(
        base + ("final_conv",), f"{p}final_conv.", identity=False, use_se=cfg.final_se
    )
    return rules


def fastvit_pose_rules(cfg, num_up_stages: int = 2) -> list[Rule]:
    """Full-variable-tree mapping for ``FastVitPoseModule`` checkpoints.

    Heads live at ``backbone.head.*`` in torch (the reference replaces
    timm's classification head attribute, fastvit_pose.py:23,135)."""
    rules = fastvit_backbone_rules(cfg)
    rules += spatial_heads_rules(
        ("pose_heads",), "backbone.head.", num_up_stages=num_up_stages
    )
    return rules


def num_batches_tracked_keys(rules: list[Rule]) -> list[str]:
    """torch BatchNorm state dicts carry ``num_batches_tracked``; synthesise
    the matching keys so exported checkpoints are byte-complete."""
    return [
        r.torch_key.replace(".running_mean", ".num_batches_tracked")
        for r in rules
        if r.torch_key.endswith(".running_mean")
    ]


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
