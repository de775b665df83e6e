"""DINOv2 Vision Transformer backbone, re-designed for TPU in Flax.

Weight-compatible with HuggingFace ``Dinov2Model`` (the backbone the reference
loads at /root/reference/model/dinov2_pose.py:13): same parameter set — cls
token, 37x37 learned position grid (image_size 518), patch-embed conv 14x14,
pre-norm blocks with LayerScale, separate q/k/v projections, exact-GELU MLP,
final LayerNorm. The checkpoint bridge (dino_pose_tpu.io.torch_bridge) maps the
torch state-dict keys onto this module's parameter tree.

TPU-first design choices (not a port):
- Activations stay NHWC / channels-last end to end; the caller hands us NCHW
  only at the public boundary for reference API parity.
- Position-embedding interpolation (needed whenever input != 518x518; bicubic,
  align_corners=False — transformers Dinov2Embeddings.interpolate_pos_encoding)
  is expressed as two precomputed static resize matrices, i.e. two tiny matmuls
  the MXU executes instead of a gather-based image resample.
- Transformer layers run as fused Pallas block (or split-half/streaming)
  kernels on TPU (dino_pose_tpu.ops.block); the standalone flash-attention
  kernel (dino_pose_tpu.ops.attention) engages on long sequences
  (S >= FLASH_MIN_SEQ = 512, e.g. 518-input fine-tuning) where it beats
  XLA — at the production S = 257 the unfused XLA path measured faster.
- Optional residual LoRA on the attention output (the reference's
  ``LoRAAttention`` wraps only the last encoder layer,
  /root/reference/model/dinov2_pose.py:197-204).
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dino_pose_tpu.nn import layers as L
from dino_pose_tpu.ops.block import (
    AttnParams,
    BlockParams,
    MlpParams,
    attn_part_math,
    block_math,
    dispatch_attn_part,
    dispatch_attn_part_stream,
    dispatch_block,
    dispatch_block_train,
    dispatch_mlp_part,
    dispatch_mlp_part_stream,
    fused_blocks_enabled,
    mlp_part_math,
    parts_fused_enabled,
    stream_fused_enabled,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    patch_size: int = 14
    # Size of the pre-trained position grid (37 for DINOv2's 518x518).
    pos_grid: int = 37
    layer_norm_eps: float = 1e-6
    layerscale_init: float = 1.0
    hidden_dropout: float = 0.0
    # How many TOP encoder layers train (reference unfreeze_last_n_layers);
    # layers below are frozen and take the fused-forward block kernel.
    num_unfrozen_layers: int = 0
    # LoRA: indices of encoder layers that get a residual output adapter.
    lora_layers: tuple[int, ...] = ()
    lora_rank: int = 8
    lora_alpha: float = 16.0
    lora_dropout: float = 0.1
    # 'bicubic' matches Dinov2; 'nearest' reproduces the reference's CoreML
    # compatibility patch (/root/reference/model/dinov2_pose.py:56-113).
    pos_interpolation: str = "bicubic"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_positions(self) -> int:
        return self.pos_grid * self.pos_grid + 1


# HF Dinov2Config values for the three registry backbones.
VIT_PRESETS: dict[str, ViTConfig] = {
    "facebook/dinov2-small": ViTConfig(hidden_size=384, num_layers=12, num_heads=6),
    "facebook/dinov2-base": ViTConfig(hidden_size=768, num_layers=12, num_heads=12),
    "facebook/dinov2-large": ViTConfig(hidden_size=1024, num_layers=24, num_heads=16),
    # Tiny preset for tests / multi-chip dry runs.
    "test/vit-tiny": ViTConfig(hidden_size=64, num_layers=2, num_heads=2, pos_grid=37),
}


class LoRAAdapter(nn.Module):
    """Residual low-rank adapter: ``dropout(x @ A @ B) * (alpha / rank)``.

    Matches the reference ``LoRALayer`` (/root/reference/model/lora.py:5-28)
    including its init: A ~ kaiming-uniform(a=sqrt(5)) over shape (in, r) whose
    torch fan-in is r, B = 0 (so the adapter starts as identity).
    """

    rank: int
    alpha: float
    dropout: float

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool) -> Array:
        d = x.shape[-1]
        a = self.param("lora_A", L.uniform_bound(1.0 / math.sqrt(self.rank)), (d, self.rank))
        b = self.param("lora_B", nn.initializers.zeros, (self.rank, d))
        h = jnp.dot(x, a.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
        h = jnp.dot(h, b.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
        h = L.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return h * (self.alpha / self.rank)


class _DenseParams(nn.Module):
    """Parameter holder with torch Linear init; used to declare q/k/v under
    their own scopes while the matmul itself runs fused in the parent."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", L.torch_kaiming_uniform(lambda s: s[0]), (in_features, self.features)
        )
        bias = self.param(
            "bias",
            L.uniform_bound(1.0 / math.sqrt(max(1, in_features))),
            (self.features,),
        )
        return kernel, bias


class _LoraAttention(nn.Module):
    """LoRA-layer attention half: LN1 + qkv + attention + out-projection run
    via the fused Pallas kernel (or the unfused math), then the residual
    LoRA adapter applies in XLA (it owns the dropout RNG). Parameter tree is
    identical to the reference's LoRAAttention wrapper — scopes
    query/key/value/out/lora_output — so checkpoints are unaffected.
    LN1's params are passed in because the reference tree keeps ``norm1`` a
    sibling of ``attention``."""

    config: ViTConfig

    @nn.compact
    def __call__(self, x: Array, norm1, *, deterministic: bool) -> Array:
        cfg = self.config
        d = cfg.hidden_size
        kernels, biases = zip(
            *(
                _DenseParams(d, name=nm)(d)
                for nm in ("query", "key", "value")
            )
        )
        wo, bo = _DenseParams(d, name="out")(d)
        ap = AttnParams(
            g1=norm1[0], b1=norm1[1],
            wqkv=jnp.concatenate(kernels, axis=1),
            bqkv=jnp.concatenate(biases),
            wo=wo, bo=bo,
        )
        # Split-kernel gating: the monolithic-budget check admits small
        # backbones; big frozen backbones (dinov2-base/large) still fit one
        # HALF in VMEM, so fall back to the split-part budget before giving
        # up on fusion (round-2 advisor: LoRA previously consulted only the
        # monolithic budget and ran dinov2-base/large fully unfused).
        if fused_blocks_enabled(
            d, x.shape[1], x.dtype.itemsize, mlp_hidden=d * cfg.mlp_ratio
        ) or parts_fused_enabled(
            d, x.shape[1], x.dtype.itemsize, cfg.num_heads,
            mlp_hidden=d * cfg.mlp_ratio,
        ):
            o = dispatch_attn_part(x, ap, cfg.num_heads, cfg.layer_norm_eps)
        elif stream_fused_enabled(
            d, x.shape[1], x.dtype.itemsize, cfg.num_heads,
            mlp_hidden=d * cfg.mlp_ratio,
        ):
            o = dispatch_attn_part_stream(
                x, ap, cfg.num_heads, cfg.layer_norm_eps
            )
        else:
            o = attn_part_math(
                x, ap, num_heads=cfg.num_heads, eps=cfg.layer_norm_eps
            )
        return o + LoRAAdapter(
            rank=cfg.lora_rank,
            alpha=cfg.lora_alpha,
            dropout=cfg.lora_dropout,
            name="lora_output",
        )(o, deterministic=deterministic)


class _NormParams(nn.Module):
    """LayerNorm parameter holder (same tree as nn/layers.LayerNorm)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        return scale, bias


class _AttnParams(nn.Module):
    """Attention parameter holder producing the HF query/key/value/out tree
    (query/key/value/out scopes) but returning the raw arrays, so the block
    can route its compute through either the fused Pallas kernel or the
    unfused math without changing the checkpoint/bridge layout."""

    hidden_size: int

    @nn.compact
    def __call__(self, in_features: int):
        kernels, biases = zip(
            *(
                _DenseParams(self.hidden_size, name=nm)(in_features)
                for nm in ("query", "key", "value")
            )
        )
        wo, bo = _DenseParams(self.hidden_size, name="out")(self.hidden_size)
        return (
            jnp.concatenate(kernels, axis=1),
            jnp.concatenate(biases),
            wo,
            bo,
        )


class Block(nn.Module):
    """Pre-norm ViT block (HF Dinov2Layer topology).

    Non-LoRA blocks declare parameters via holders and route compute through
    :func:`dino_pose_tpu.ops.block.block_math` (XLA) or, when the layer is
    frozen or the pass is inference, the fused single-program Pallas kernel
    :func:`dino_pose_tpu.ops.block.fused_block` — one HBM read and one write
    per layer. LoRA blocks keep the module path (adapter + its dropout RNG).
    Both routes produce the identical parameter tree.
    """

    config: ViTConfig
    use_lora: bool = False
    frozen: bool = False  # no gradients flow to this layer's params

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool) -> Array:
        cfg = self.config
        if self.use_lora:
            return self._lora_path(x, deterministic=deterministic)

        d = cfg.hidden_size
        g1, b1 = _NormParams(name="norm1")(d)
        wqkv, bqkv, wo, bo = _AttnParams(d, name="attention")(d)
        ls1 = self.param(
            "layerscale1",
            lambda key, shape: jnp.full(shape, cfg.layerscale_init, jnp.float32),
            (d,),
        )
        g2, b2 = _NormParams(name="norm2")(d)
        w1, bf1 = _DenseParams(d * cfg.mlp_ratio, name="fc1")(d)
        w2, bf2 = _DenseParams(d, name="fc2")(d * cfg.mlp_ratio)
        ls2 = self.param(
            "layerscale2",
            lambda key, shape: jnp.full(shape, cfg.layerscale_init, jnp.float32),
            (d,),
        )
        p = BlockParams(g1, b1, wqkv, bqkv, wo, bo, ls1, g2, b2, w1, bf1, w2, bf2, ls2)
        if fused_blocks_enabled(
            d, x.shape[1], x.dtype.itemsize, mlp_hidden=d * cfg.mlp_ratio
        ):
            if self.frozen or deterministic:
                # Forward-only fused kernel: no gradient flows through a
                # frozen/inference block's params; the fallback VJP (unfused
                # math) exists for correctness only.
                return dispatch_block(x, p, cfg.num_heads, cfg.layer_norm_eps)
            if cfg.hidden_dropout == 0.0:
                # Trainable block without in-block dropout (the reference's
                # unfreeze-last-N mode): fully fused Pallas forward+backward.
                return dispatch_block_train(
                    x, p, cfg.num_heads, cfg.layer_norm_eps
                )
        elif (self.frozen or deterministic) and parts_fused_enabled(
            d, x.shape[1], x.dtype.itemsize, cfg.num_heads,
            mlp_hidden=d * cfg.mlp_ratio,
        ):
            # Big backbones (dinov2-base): the monolithic kernel's weights
            # exceed VMEM, but each half fits — fuse per half with the
            # LayerScale+residual stitch in XLA.
            ap = AttnParams(g1, b1, wqkv, bqkv, wo, bo)
            o = dispatch_attn_part(x, ap, cfg.num_heads, cfg.layer_norm_eps)
            x2 = x + o * ls1.astype(o.dtype)
            mp = MlpParams(g2, b2, w1, bf1, w2, bf2, ls2)
            return dispatch_mlp_part(x2, mp, cfg.layer_norm_eps)
        elif (self.frozen or deterministic) and stream_fused_enabled(
            d, x.shape[1], x.dtype.itemsize, cfg.num_heads,
            mlp_hidden=d * cfg.mlp_ratio,
        ):
            # dinov2-large: even one half's weights exceed VMEM; stream
            # weight blocks through while activations stay resident.
            ap = AttnParams(g1, b1, wqkv, bqkv, wo, bo)
            o = dispatch_attn_part_stream(x, ap, cfg.num_heads, cfg.layer_norm_eps)
            x2 = x + o * ls1.astype(o.dtype)
            mp = MlpParams(g2, b2, w1, bf1, w2, bf2, ls2)
            return dispatch_mlp_part_stream(x2, mp, cfg.layer_norm_eps)
        elif cfg.hidden_dropout == 0.0 and stream_fused_enabled(
            d, x.shape[1], x.dtype.itemsize, cfg.num_heads,
            mlp_hidden=d * cfg.mlp_ratio, for_training=True,
        ):
            # TRAINABLE big-D block (unfreeze-N on dinov2-base/large, where
            # neither the monolithic nor the resident-half backward fits
            # VMEM): streaming forwards with FULL streaming backwards —
            # dx + hidden-block-major dw for the MLP half, dx + head-group-
            # major dw for the attention half (exact unfused vjp fallback
            # when no plan fits, e.g. S=1370 at D=1024).
            ap = AttnParams(g1, b1, wqkv, bqkv, wo, bo)
            o = dispatch_attn_part_stream(x, ap, cfg.num_heads, cfg.layer_norm_eps)
            x2 = x + o * ls1.astype(o.dtype)
            mp = MlpParams(g2, b2, w1, bf1, w2, bf2, ls2)
            return dispatch_mlp_part_stream(x2, mp, cfg.layer_norm_eps)
        if not (self.frozen or deterministic) and cfg.hidden_dropout > 0.0:
            # In-block dropout, HF semantics: Dinov2SelfOutput applies
            # hidden_dropout after the attention out-projection (before
            # LayerScale); Dinov2MLP has none. block_math cannot host an
            # RNG, so the dropout-training path composes the two unfused
            # halves explicitly.
            ap = AttnParams(g1, b1, wqkv, bqkv, wo, bo)
            o = attn_part_math(
                x, ap, num_heads=cfg.num_heads, eps=cfg.layer_norm_eps
            )
            o = nn.Dropout(rate=cfg.hidden_dropout)(o, deterministic=False)
            x2 = x + o * ls1.astype(o.dtype)
            mp = MlpParams(g2, b2, w1, bf1, w2, bf2, ls2)
            return mlp_part_math(x2, mp, eps=cfg.layer_norm_eps)
        return block_math(x, p, num_heads=cfg.num_heads, eps=cfg.layer_norm_eps)

    def _lora_path(self, x: Array, *, deterministic: bool) -> Array:
        """LoRA block: fused attention half -> adapter (XLA, dropout RNG) ->
        fused MLP half. Same math and parameter tree as the legacy
        LN/attention/Dense composition; the attention half's backward is
        never pulled (nothing below the adapter is trainable in LoRA
        configs), and the MLP half has a true Pallas backward carrying the
        adapter's cotangent through dx2."""
        cfg = self.config
        d = cfg.hidden_size
        g1, b1 = _NormParams(name="norm1")(d)
        o = _LoraAttention(cfg, name="attention")(
            x, (g1, b1), deterministic=deterministic
        )
        ls1 = self.param(
            "layerscale1",
            lambda key, shape: jnp.full(shape, cfg.layerscale_init, jnp.float32),
            (d,),
        )
        x2 = x + o * ls1.astype(o.dtype)

        g2, b2 = _NormParams(name="norm2")(d)
        w1, bf1 = _DenseParams(d * cfg.mlp_ratio, name="fc1")(d)
        w2, bf2 = _DenseParams(d, name="fc2")(d * cfg.mlp_ratio)
        ls2 = self.param(
            "layerscale2",
            lambda key, shape: jnp.full(shape, cfg.layerscale_init, jnp.float32),
            (d,),
        )
        mp = MlpParams(g2, b2, w1, bf1, w2, bf2, ls2)
        if fused_blocks_enabled(
            d, x.shape[1], x.dtype.itemsize, mlp_hidden=d * cfg.mlp_ratio
        ) or parts_fused_enabled(
            d, x.shape[1], x.dtype.itemsize, cfg.num_heads,
            mlp_hidden=d * cfg.mlp_ratio,
        ):
            # assume_frozen_weights: LoRA configs freeze the entire backbone
            # (reference dinov2_pose.py:176-204; enforced by
            # train/partition.trainable_mask), so the MLP half's backward
            # skips its weight-gradient accumulation. The same split-part
            # budget as the frozen elif branch admits dinov2-base.
            return dispatch_mlp_part(
                x2, mp, cfg.layer_norm_eps, assume_frozen_weights=True
            )
        if stream_fused_enabled(
            d, x.shape[1], x.dtype.itemsize, cfg.num_heads,
            mlp_hidden=d * cfg.mlp_ratio,
        ):
            # dinov2-large: streaming MLP half; the adapter's cotangent flows
            # through the streaming activation-only dx kernel.
            return dispatch_mlp_part_stream(
                x2, mp, cfg.layer_norm_eps, assume_frozen_weights=True
            )
        return mlp_part_math(x2, mp, eps=cfg.layer_norm_eps)


class Dinov2Backbone(nn.Module):
    """DINOv2 encoder. Input NHWC pixel values; returns all token embeddings.

    ``__call__`` returns ``(tokens, patch_grid)`` where ``tokens`` is
    (B, 1 + Hp*Wp, D) after the final LayerNorm and ``patch_grid`` the (Hp, Wp)
    spatial shape of the patch tokens.
    """

    config: ViTConfig

    @nn.compact
    def __call__(self, pixels_nhwc: Array, *, deterministic: bool = True):
        cfg = self.config
        b, h, w, _ = pixels_nhwc.shape
        hp, wp = h // cfg.patch_size, w // cfg.patch_size

        x = L.Conv(
            features=cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            name="patch_embed",
        )(pixels_nhwc)
        x = x.reshape(b, hp * wp, cfg.hidden_size)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, cfg.hidden_size)
        )
        # Present for HF checkpoint compatibility; unused in pose inference.
        self.param("mask_token", nn.initializers.zeros, (1, cfg.hidden_size))
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(1.0),
            (1, cfg.num_positions, cfg.hidden_size),
        )

        x = jnp.concatenate([jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, cfg.hidden_size)), x], axis=1)
        x = x + self._interpolated_pos(pos, hp, wp).astype(x.dtype)
        x = L.Dropout(rate=cfg.hidden_dropout)(x, deterministic=deterministic)

        first_unfrozen = cfg.num_layers - cfg.num_unfrozen_layers
        if cfg.lora_layers and cfg.num_unfrozen_layers:
            # LoRA implies a fully-frozen backbone (reference semantics,
            # dinov2_pose.py:176-204; the registry enforces it). A LoRA
            # layer inside the unfrozen range would take _lora_path, whose
            # assume_frozen_weights backward SILENTLY zeroes the MLP weight
            # gradients — fail loudly instead.
            raise ValueError(
                "lora_layers and num_unfrozen_layers are mutually exclusive: "
                "LoRA configs freeze the whole backbone"
            )
        for i in range(cfg.num_layers):
            x = Block(
                cfg,
                use_lora=(i in cfg.lora_layers),
                frozen=(i < first_unfrozen and i not in cfg.lora_layers),
                name=f"layer{i}",
            )(x, deterministic=deterministic)

        x = L.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)
        return x, (hp, wp)

    def _interpolated_pos(self, pos: Array, hp: int, wp: int) -> Array:
        cfg = self.config
        g = cfg.pos_grid
        if hp == g and wp == g:
            return pos
        cls_pos = pos[:, :1]
        patch_pos = pos[:, 1:].reshape(1, g, g, cfg.hidden_size)
        if cfg.pos_interpolation == "bicubic":
            mh = jnp.asarray(L.cubic_resize_matrix(g, hp), pos.dtype)
            mw = jnp.asarray(L.cubic_resize_matrix(g, wp), pos.dtype)
        elif cfg.pos_interpolation == "nearest":
            mh = jnp.asarray(L.nearest_resize_matrix(g, hp), pos.dtype)
            mw = jnp.asarray(L.nearest_resize_matrix(g, wp), pos.dtype)
        else:
            raise ValueError(f"Unknown pos_interpolation: {cfg.pos_interpolation}")
        # Interpolation in float32 regardless of activation dtype (matches HF).
        patch_pos = jnp.einsum("oh,bhwd->bowd", mh, patch_pos.astype(jnp.float32))
        patch_pos = jnp.einsum("pw,bowd->bopd", mw, patch_pos)
        patch_pos = patch_pos.reshape(1, hp * wp, cfg.hidden_size).astype(pos.dtype)
        return jnp.concatenate([cls_pos, patch_pos], axis=1)
