"""FastViT backbone in Flax (hybrid conv/attention, RepMixer stages).

Re-implements the architecture the reference consumes via
``timm.create_model('fastvit_*')`` (/root/reference/model/fastvit_pose.py:21)
— Apple's FastViT: a convolutional stem, four stages of RepMixer (or, in the
SA/MA variants, self-attention in the last stage) blocks with ConvFFN MLPs,
reparameterisable-conv patch embeddings between stages, and a final
SE-augmented expansion conv (dims[-1] -> 2*dims[-1], the "384 -> 768" of
fastvit_pose.py:79).

TPU-first choices:

- Everything is NHWC; depthwise convs map to XLA's grouped convolutions.
- The multi-branch "MobileOne" blocks keep the reference's *training-time*
  branch parameterisation (kxk conv + 1x1 scale branch + identity BN) in
  the checkpoint tree. In EVAL mode they execute as one folded conv per
  block (``fastvit_fold`` module: BN with known statistics is affine, so
  the branches collapse algebraically). In TRAIN mode the measured-fastest
  arrangement (and the default) is branch-output REUSE: each materialised
  branch feeds its own BN affine elementwise and the scale/identity
  branches become per-channel coefficients on x, while the
  BN-affine-into-matmul folds (ConvFFN fc1, attention qkv) revert to
  branch math — folding a batch-stat affine into a FROZEN weight forces a
  weight-gradient matmul in backward. Hardware A/B grid in
  ``fastvit_fold.train_block_mode`` / ``ffn_fold_active`` (reuse+branchFFN
  2027 > branch 1872-1881 > reuse+foldFFN 1847 > fold 1557 img/s).
  ``fuse_mobileone_params`` (below) provides the same algebra as an
  explicit parameter transform for deployment-time export.
- Attention stages flatten (H, W) to one token axis and reuse the same
  fused attention op as the ViT (dino_pose_tpu.ops.attention).

LoRA (reference semantics, /root/reference/model/lora.py:68-149): 1x1-conv
adapter pairs on *every* ConvFFN fc1/fc2 across all stages; base weights stay
frozen via the trainer's optimizer mask.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from dino_pose_tpu.models import fastvit_fold as F
from dino_pose_tpu.nn import layers as L
from dino_pose_tpu.ops.attention import attention as fused_attention

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FastViTConfig:
    embed_dims: tuple[int, ...] = (48, 96, 192, 384)
    depths: tuple[int, ...] = (2, 2, 4, 2)
    mlp_ratios: tuple[float, ...] = (3.0, 3.0, 3.0, 3.0)
    token_mixers: tuple[str, ...] = ("repmixer",) * 4
    pos_embs: tuple[bool, ...] = (False, False, False, False)  # RepCPE per stage
    layer_scale_init: float = 1e-5
    attn_head_dim: int = 32
    final_se: bool = True
    # LoRA over ConvFFN fc1/fc2 (0 = disabled).
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.1

    @property
    def out_channels(self) -> int:
        return 2 * self.embed_dims[-1]


_SA = dict(
    embed_dims=(64, 128, 256, 512),
    mlp_ratios=(4.0,) * 4,
    token_mixers=("repmixer", "repmixer", "repmixer", "attention"),
    pos_embs=(False, False, False, True),
)

FASTVIT_PRESETS: dict[str, FastViTConfig] = {
    "t8": FastViTConfig(),
    "t12": FastViTConfig(embed_dims=(64, 128, 256, 512), depths=(2, 2, 6, 2)),
    "s12": FastViTConfig(
        embed_dims=(64, 128, 256, 512), depths=(2, 2, 6, 2), mlp_ratios=(4.0,) * 4
    ),
    "sa12": FastViTConfig(depths=(2, 2, 6, 2), **_SA),
    "sa24": FastViTConfig(depths=(4, 4, 12, 4), **_SA),
    "sa36": FastViTConfig(depths=(6, 6, 18, 6), **_SA),
    "ma36": FastViTConfig(
        depths=(6, 6, 18, 6),
        embed_dims=(76, 152, 304, 608),
        mlp_ratios=(4.0,) * 4,
        token_mixers=("repmixer", "repmixer", "repmixer", "attention"),
        pos_embs=(False, False, False, True),
    ),
    # Tiny preset for tests.
    "test-tiny": FastViTConfig(
        embed_dims=(8, 16, 32, 64),
        depths=(1, 1, 1, 1),
        token_mixers=("repmixer", "repmixer", "repmixer", "attention"),
        pos_embs=(False, False, False, True),
        attn_head_dim=16,
    ),
}


class SEBlock(nn.Module):
    """Squeeze-excite (rd_ratio 1/16, conv-parameterised like the original)."""

    rd_ratio: float = 1.0 / 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        rd = max(1, int(c * self.rd_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = L.Conv(rd, kernel_size=(1, 1), name="reduce")(s)
        s = nn.relu(s)
        s = L.Conv(c, kernel_size=(1, 1), name="expand")(s)
        return x * jax.nn.sigmoid(s)


class MobileOneBlock(nn.Module):
    """Multi-branch re-parameterisable conv block.

    branches: ``num_conv_branches`` x (kxk conv + BN), a (1x1 conv + BN) scale
    branch when kernel > 1, and an identity BN branch when shapes allow;
    summed, optionally SE'd, optionally activated (GELU).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    use_act: bool = True
    use_se: bool = False
    use_scale_branch: bool = True
    num_conv_branches: int = 1

    @nn.compact
    def __call__(
        self,
        x: Array,
        *,
        train: bool,
        return_fold: bool = False,
        return_terms: bool = False,
    ):
        if return_terms or (
            F.block_fold_active(train) and F.block_reuse_active(train)
            and not return_fold
        ):
            return self._reuse(x, train=train, return_terms=return_terms)
        if F.block_fold_active(train) or return_fold:
            return self._folded(x, train=train, return_fold=return_fold)
        k, s = self.kernel_size, self.strides
        in_ch = x.shape[-1]
        out = 0.0
        for b in range(self.num_conv_branches):
            y = L.Conv(
                self.features, kernel_size=(k, k), strides=(s, s),
                padding=(k // 2, k // 2), feature_group_count=self.groups,
                use_bias=False, name=f"conv{b}",
            )(x)
            out = out + L.BatchNorm(name=f"conv{b}_bn")(y, use_running_average=not train)
        if self.use_scale_branch and k > 1:
            y = L.Conv(
                self.features, kernel_size=(1, 1), strides=(s, s), padding=(0, 0),
                feature_group_count=self.groups, use_bias=False, name="scale",
            )(x)
            out = out + L.BatchNorm(name="scale_bn")(y, use_running_average=not train)
        if in_ch == self.features and s == 1:
            out = out + L.BatchNorm(name="skip_bn")(x, use_running_average=not train)
        if self.use_se:
            out = SEBlock(name="se")(out)
        return nn.gelu(out, approximate=False) if self.use_act else out

    def _reuse(self, x: Array, *, train: bool, return_terms: bool):
        """Train-mode branch-output reuse (fastvit_fold.train_block_mode):
        every materialised branch output feeds its OWN BN affine elementwise
        (``inv * y + shift``), and branches whose statistics are exact
        functions of x's moments become a per-channel coefficient on x — no
        second folded conv over the input. Mathematically identical to the
        branch math / plain fold; parameter tree unchanged.

        With ``return_terms`` the unapplied representation is returned as
        ``(terms, x_coeff, bias)`` — ``terms`` a list of f32 ``(inv, y)``
        pairs, ``x_coeff`` the f32 per-channel coefficient on x — so a
        parent (RepMixer) can merge further. Only stride-1, multiplier-1
        blocks may be returned as terms (the coefficient applies to x on
        the block's own grid)."""
        if not train:
            raise ValueError("_reuse is the train-mode path (eval folds to one conv)")
        k, s = self.kernel_size, self.strides
        in_ch = x.shape[-1]
        in_g = in_ch // self.groups
        mult = self.features // self.groups
        terms: list[tuple[Array, Array]] = []
        xc = None  # f32 per-channel coefficient on x (stride-sampled grid)
        xc_rep = None  # same, but on repeat(x, mult) (depthwise-multiplier scale)
        bias = jnp.zeros((self.features,), jnp.float32)

        for b in range(self.num_conv_branches):
            kern = F.ConvParams(
                self.features, (k, k), self.groups, name=f"conv{b}"
            )(in_ch)
            y, inv, shift = F.stats_branch_reuse(
                x, kern, F.BNAffine(self.features, name=f"conv{b}_bn"),
                strides=(s, s), groups=self.groups,
            )
            terms.append((inv, y))
            bias = bias + shift

        if self.use_scale_branch and k > 1:
            skern = F.ConvParams(
                self.features, (1, 1), self.groups, name="scale"
            )(in_ch)
            sbn = F.BNAffine(self.features, name="scale_bn")
            if in_g == 1:
                # Depthwise(-multiplier) 1x1: the branch IS a per-channel
                # scalar on x, so both its statistics and its output are
                # exact functions of x — contribute a coefficient, no conv.
                mx, m2x, n = F.channel_moments(x, (s, s))
                svec = skern[0, 0, 0, :].astype(jnp.float32)
                mean = svec * jnp.repeat(mx, mult)
                var = jnp.square(svec) * jnp.repeat(m2x, mult) - jnp.square(mean)
                inv, shift = sbn(mean, var, n, train=True)
                coeff = inv * svec
                if mult == 1:
                    xc = coeff if xc is None else xc + coeff
                else:
                    xc_rep = coeff if xc_rep is None else xc_rep + coeff
            elif self.groups == 1 and in_ch <= 8:
                # Dense 1x1 over few channels (stem0): gram-matrix moments,
                # branch output via one tiny matmul on the strided grid.
                xs = x[:, ::s, ::s, :].astype(jnp.float32)
                flat = xs.reshape(-1, in_ch)
                n = flat.shape[0]
                mu = jnp.mean(flat, axis=0)
                gram = flat.T @ flat / n
                w = skern[0, 0].astype(jnp.float32)
                mean = mu @ w
                var = jnp.einsum("co,do,cd->o", w, w, gram) - jnp.square(mean)
                inv, shift = sbn(mean, var, n, train=True)
                # Branch output as in_ch broadcast FMAs, not a matmul: a
                # K=3 GEMM producing (B, 128, 128, 48) runs the MXU at
                # ~2.3% fill and cost 1.6 ms/step in the round-5 trace
                # (fusion.79); the elementwise form fuses into one
                # bandwidth-bound pass.
                y_scale = xs[..., 0:1] * w[0]
                for ci in range(1, in_ch):
                    y_scale = y_scale + xs[..., ci : ci + 1] * w[ci]
                terms.append((inv, y_scale))
            else:
                y, inv, shift = F.stats_branch_reuse(
                    x, skern, sbn, strides=(s, s), groups=self.groups,
                )
                terms.append((inv, y))
            bias = bias + shift

        if in_ch == self.features and s == 1:
            ibn = F.BNAffine(self.features, name="skip_bn")
            mx, m2x, n = F.channel_moments(x)
            inv, shift = ibn(mx, m2x - jnp.square(mx), n, train=True)
            xc = inv if xc is None else xc + inv
            bias = bias + shift

        if return_terms:
            if self.use_se or self.use_act:
                raise ValueError(
                    "return_terms only represents the linear conv+BN part: "
                    "a block with use_se/use_act cannot be merged into a "
                    "parent combine."
                )
            if s != 1 or xc_rep is not None:
                raise ValueError(
                    "return_terms requires a stride-1, multiplier-1 block "
                    "(the x coefficient must live on the caller's grid)"
                )
            return (
                terms,
                xc if xc is not None else jnp.zeros((self.features,), jnp.float32),
                bias,
            )

        out = bias
        for inv, y in terms:
            out = y.astype(jnp.float32) * inv + out
        if xc is not None or xc_rep is not None:
            x_s = x[:, ::s, ::s, :] if s != 1 else x
            if xc is not None:
                out = out + x_s.astype(jnp.float32) * xc
            if xc_rep is not None:
                out = out + jnp.repeat(x_s, mult, axis=-1).astype(jnp.float32) * xc_rep
        out = out.astype(x.dtype)
        if self.use_se:
            out = SEBlock(name="se")(out)
        return nn.gelu(out, approximate=False) if self.use_act else out

    def _folded(self, x: Array, *, train: bool, return_fold: bool):
        """Train-time reparameterisation fold (fastvit_fold module docstring):
        per-branch batch statistics -> one equivalent kxk conv. Identical
        parameter tree and (to fp tolerance) identical function; with
        ``return_fold`` the folded (kernel, bias) is returned unapplied so a
        parent (RepMixer) can merge further."""
        k, s = self.kernel_size, self.strides
        in_ch = x.shape[-1]
        in_g = in_ch // self.groups
        kf = jnp.zeros((k, k, in_g, self.features), jnp.float32)
        bf = jnp.zeros((self.features,), jnp.float32)
        pad_c = (k // 2, k - 1 - k // 2)

        for b in range(self.num_conv_branches):
            kern = F.ConvParams(
                self.features, (k, k), self.groups, name=f"conv{b}"
            )(in_ch)
            kt, bt = F.fold_stats_branch(
                x, kern, F.BNAffine(self.features, name=f"conv{b}_bn"),
                k=k, strides=(s, s), groups=self.groups, train=train,
            )
            kf = kf + kt
            bf = bf + bt

        if self.use_scale_branch and k > 1:
            skern = F.ConvParams(
                self.features, (1, 1), self.groups, name="scale"
            )(in_ch)
            sbn = F.BNAffine(self.features, name="scale_bn")
            if train and in_g == 1:
                # Depthwise(-multiplier) 1x1: per-channel scalar, so the
                # branch statistics are exact functions of x's moments.
                mult = self.features // self.groups
                mx, m2x, n = F.channel_moments(x, (s, s))
                svec = skern[0, 0, 0, :].astype(jnp.float32)
                mean = svec * jnp.repeat(mx, mult)
                var = jnp.square(svec) * jnp.repeat(m2x, mult) - jnp.square(mean)
                inv, shift = sbn(mean, var, n, train=True)
                kt = jnp.pad(
                    skern.astype(jnp.float32) * inv, (pad_c, pad_c, (0, 0), (0, 0))
                )
                bt = shift
            elif train and self.groups == 1 and in_ch <= 8:
                # Dense 1x1 over few channels (stem0's RGB input): second
                # moments via one tiny gram matrix on the strided grid.
                xs = x[:, ::s, ::s, :].astype(jnp.float32)
                flat = xs.reshape(-1, in_ch)
                n = flat.shape[0]
                mu = jnp.mean(flat, axis=0)
                gram = flat.T @ flat / n
                w = skern[0, 0].astype(jnp.float32)
                mean = mu @ w
                var = jnp.einsum("co,do,cd->o", w, w, gram) - jnp.square(mean)
                inv, shift = sbn(mean, var, n, train=True)
                kt = jnp.pad(
                    skern.astype(jnp.float32) * inv, (pad_c, pad_c, (0, 0), (0, 0))
                )
                bt = shift
            else:
                # Eval (running stats), or a grouped-non-depthwise / wide
                # dense scale branch whose statistics need the materialised
                # branch output.
                kt, bt = F.fold_stats_branch(
                    x, skern, sbn,
                    k=k, strides=(s, s), groups=self.groups, train=train,
                )
            kf = kf + kt
            bf = bf + bt

        has_skip = in_ch == self.features and s == 1
        if has_skip:
            ibn = F.BNAffine(self.features, name="skip_bn")
            if train:
                mx, m2x, n = F.channel_moments(x)
                inv, shift = ibn(mx, m2x - jnp.square(mx), n, train=True)
            else:
                inv, shift = ibn(train=False)
            ident = jnp.asarray(F._center_identity(k, k, in_g, self.features))
            kf = kf + ident * inv
            bf = bf + shift

        if return_fold:
            if self.use_se or self.use_act:
                raise ValueError(
                    "return_fold only represents the linear conv+BN part: "
                    "a block with use_se/use_act cannot be folded into a "
                    "parent (kernel, bias)."
                )
            return kf, bf
        if (
            has_skip
            and self.num_conv_branches == 0
            and not (self.use_scale_branch and k > 1)
        ):
            # Pure-affine block (identity BN only): no conv needed.
            out = (x.astype(jnp.float32) * inv + shift).astype(x.dtype)
        else:
            out = F.apply_folded(
                x, kf, bf, strides=(s, s), padding=(k // 2, k // 2),
                feature_group_count=self.groups,
            )
        if self.use_se:
            out = SEBlock(name="se")(out)
        return nn.gelu(out, approximate=False) if self.use_act else out


class ReparamLargeKernelConv(nn.Module):
    """Large-kernel depthwise conv with a parallel small-kernel branch."""

    features: int
    kernel_size: int = 7
    strides: int = 2
    groups: int = 1
    small_kernel: int = 3
    use_act: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        k, s = self.kernel_size, self.strides
        sk = self.small_kernel
        if F.block_fold_active(train):
            in_ch = x.shape[-1]
            if F.block_reuse_active(train):
                # Both branch outputs are materialised for their statistics
                # anyway — combine them elementwise through their BN affines
                # instead of paying a THIRD (folded kxk) conv over x.
                acc = None
                for name, bk in (("large", k), ("small", sk)):
                    kern = F.ConvParams(
                        self.features, (bk, bk), self.groups, name=name
                    )(in_ch)
                    y, inv, shift = F.stats_branch_reuse(
                        x, kern, F.BNAffine(self.features, name=f"{name}_bn"),
                        strides=(s, s), groups=self.groups,
                    )
                    t = y.astype(jnp.float32) * inv + shift
                    acc = t if acc is None else acc + t
                out = acc.astype(x.dtype)
                return nn.gelu(out, approximate=False) if self.use_act else out
            in_g = in_ch // self.groups
            kf = jnp.zeros((k, k, in_g, self.features), jnp.float32)
            bf = jnp.zeros((self.features,), jnp.float32)
            for name, bk in (("large", k), ("small", sk)):
                kern = F.ConvParams(
                    self.features, (bk, bk), self.groups, name=name
                )(in_ch)
                kt, bt = F.fold_stats_branch(
                    x, kern, F.BNAffine(self.features, name=f"{name}_bn"),
                    k=k, strides=(s, s), groups=self.groups, train=train,
                )
                kf = kf + kt
                bf = bf + bt
            out = F.apply_folded(
                x, kf, bf, strides=(s, s), padding=(k // 2, k // 2),
                feature_group_count=self.groups,
            )
            return nn.gelu(out, approximate=False) if self.use_act else out
        y = L.Conv(
            self.features, kernel_size=(k, k), strides=(s, s),
            padding=(k // 2, k // 2), feature_group_count=self.groups,
            use_bias=False, name="large",
        )(x)
        out = L.BatchNorm(name="large_bn")(y, use_running_average=not train)
        y = L.Conv(
            self.features, kernel_size=(sk, sk), strides=(s, s),
            padding=(sk // 2, sk // 2), feature_group_count=self.groups,
            use_bias=False, name="small",
        )(x)
        out = out + L.BatchNorm(name="small_bn")(y, use_running_average=not train)
        return nn.gelu(out, approximate=False) if self.use_act else out


class PatchEmbed(nn.Module):
    """Between-stage downsample: 7x7 reparam depthwise s2 + 1x1 MobileOne."""

    features: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        x = ReparamLargeKernelConv(
            self.features, kernel_size=7, strides=2, groups=x.shape[-1],
            small_kernel=3, name="proj",
        )(x, train=train)
        x = MobileOneBlock(
            self.features, kernel_size=1, strides=1, name="mix",
        )(x, train=train)
        return x


class RepCPE(nn.Module):
    """Conditional positional encoding: x + depthwise 7x7 conv(x)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        return x + L.Conv(
            c, kernel_size=(7, 7), padding=(3, 3), feature_group_count=c,
            use_bias=True, name="pe",
        )(x)


class ConvLoRA(nn.Module):
    """1x1-conv LoRA adapter pair (reference ConvLoRA, lora.py:68-121)."""

    rank: int
    alpha: float
    dropout: float

    @nn.compact
    def __call__(
        self,
        x: Array,
        out_features: int,
        *,
        deterministic: bool,
        in_affine: tuple[Array, Array] | None = None,
    ) -> Array:
        # Reference order (lora.py:112-120): A -> Dropout2d (whole rank
        # channels) -> B -> scale.
        if in_affine is not None:
            # x is the PRE-affine tensor; fold the per-channel (inv, shift)
            # of the preceding BatchNorm into lora_A so the normalised
            # activation is never materialised: A(x*inv + shift) =
            # conv(x, A*inv) + shift @ A.
            inv, shift = in_affine
            ak = F.ConvParams(self.rank, (1, 1), name="lora_A")(x.shape[-1])
            y = F.apply_folded(
                x, ak.astype(jnp.float32) * inv[:, None],
                shift @ ak[0, 0].astype(jnp.float32),
                strides=(1, 1), padding=(0, 0),
            )
        else:
            y = L.Conv(self.rank, kernel_size=(1, 1), use_bias=False, name="lora_A")(x)
        y = L.Dropout(rate=self.dropout, broadcast_dims=(1, 2))(
            y, deterministic=deterministic
        )
        # Explicit compute-dtype conv for lora_B: flax's nn.Conv promotes
        # bf16 activations x f32 kernel to an f32 OUTPUT, which dragged the
        # whole downstream FFN chain (gelu, fc2, residual and their
        # backwards) into full-hidden f32 passes at the unfused stages
        # (round-5 trace). The fused ConvFFN kernel already stages LoRA in
        # the compute dtype (ops/convffn.py), so this also aligns the two
        # paths' numerics.
        bk = F.ZeroConvParams(out_features, (1, 1), name="lora_B")(self.rank)
        y = jax.lax.conv_general_dilated(
            y.astype(x.dtype), bk.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y * jnp.asarray(self.alpha / self.rank, x.dtype)


class ConvLoRAParams(nn.Module):
    """Raw-parameter holder matching ``ConvLoRA``'s tree (fc*_lora/lora_A/
    kernel + lora_B/kernel, same shapes and inits) for the fused-kernel
    path, which consumes the adapters as squeezed matmul operands."""

    rank: int
    out_features: int

    @nn.compact
    def __call__(self, in_features: int) -> tuple[Array, Array]:
        a = F.ConvParams(self.rank, (1, 1), name="lora_A")(in_features)
        b = F.ZeroConvParams(self.out_features, (1, 1), name="lora_B")(self.rank)
        return a[0, 0], b[0, 0]


class ConvFFN(nn.Module):
    """7x7 depthwise conv + BN, then 1x1 fc1 -> GELU -> 1x1 fc2."""

    hidden: int
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.1

    def _fused_params(self, inv, shift, c: int, b: int, train: bool):
        """(ConvFFNParams, s_lora) for the fused kernels: squeezed fc1/fc2
        kernels, LoRA adapters (rank-1 zeros when disabled) and the
        per-(sample, rank) Dropout2d masks (reference lora.py:112-120)."""
        from dino_pose_tpu.ops import convffn as CK

        k1, b1 = F.DenseConvParams(self.hidden, (1, 1), name="fc1")(c)
        k2, b2 = F.DenseConvParams(c, (1, 1), name="fc2")(self.hidden)
        r = self.lora_rank
        if r > 0:
            a1, b1l = ConvLoRAParams(r, self.hidden, name="fc1_lora")(c)
            a2, b2l = ConvLoRAParams(r, c, name="fc2_lora")(self.hidden)
            s_lora = self.lora_alpha / r
            if train and self.lora_dropout > 0.0:
                keep = 1.0 - self.lora_dropout
                draw = lambda: (
                    jax.random.bernoulli(
                        self.make_rng("dropout"), keep, (b, r)
                    ).astype(jnp.float32)
                    / keep
                )
                m1, m2 = draw(), draw()
            else:
                m1 = m2 = jnp.ones((b, r), jnp.float32)
        else:
            # Rank-1 zero adapters: algebraically absent, one kernel.
            a1 = jnp.zeros((c, 1), jnp.float32)
            b1l = jnp.zeros((1, self.hidden), jnp.float32)
            a2 = jnp.zeros((self.hidden, 1), jnp.float32)
            b2l = jnp.zeros((1, c), jnp.float32)
            m1 = m2 = jnp.ones((b, 1), jnp.float32)
            s_lora = 1.0
        p = CK.ConvFFNParams(
            inv=inv, shift=shift, w1=k1[0, 0], b1=b1, w2=k2[0, 0], b2=b2,
            a1=a1, b1l=b1l, a2=a2, b2l=b2l, m1=m1, m2=m2,
        )
        return p, s_lora

    @nn.compact
    def __call__(
        self,
        x: Array,
        *,
        train: bool,
        pair: tuple | None = None,
        ls2: Array | None = None,
    ) -> Array:
        from dino_pose_tpu.ops import convffn as CK
        from dino_pose_tpu.ops import dwconv as DWK

        c = x.shape[-1]
        # Same parameter ('conv'/kernel, torch kaiming init) as the L.Conv
        # this replaces; dw_branch_conv routes stride-1 depthwise shapes
        # through the lane-packed Pallas kernel when gated (ops/dwconv.py).
        kern = F.ConvParams(c, (7, 7), c, name="conv")(c)
        if pair is not None:
            # Fused-pair path (FastViTBlock): ``x`` is the BLOCK input and
            # the return value is the BLOCK output
            #     x2 = a*x + b*y0 + bias            (RepMixer, combined)
            #     out = x2 + ls2 * ConvFFN(x2)
            # via two segment kernels — combine+dw7 (ops/dwconv.py) and
            # BN-affine+FFN+LoRA+residual (ops/convffn.py) — with the two
            # batch-stat barriers (y0 handled by the caller, y7 here) at
            # the XLA level between them. LayerScale folds into the
            # output-side parameters (w2, b2, b2l) at the XLA level: valid
            # for gradients because w2/b2 are frozen (zero cotangent) and
            # b2l's chain runs through the visible multiply; ls2 itself is
            # frozen in every FastViT training mode (train/partition.py).
            a, bvec, biasvec, y0 = pair
            x2, y7 = DWK.dispatch_combine_dw(x, y0, a, bvec, biasvec, kern)
            b, hh, ww, _ = y7.shape
            bn = F.BNAffine(c, name="conv_bn")
            mean, var, n = F.branch_stats(y7)
            inv, shift = bn(mean, var, n, train=True)
            p, s_lora = self._fused_params(inv, shift, c, b, train)
            ls2f = ls2.astype(jnp.float32)
            p = p._replace(
                w2=p.w2 * ls2f[None, :], b2=p.b2 * ls2f,
                b2l=p.b2l * ls2f[None, :],
            )
            out = CK.dispatch_convffn_res(
                y7.reshape(b, hh * ww, c), x2.reshape(b, hh * ww, c), p, s_lora
            )
            return out.reshape(b, hh, ww, c)
        y = F.dw_branch_conv(x, kern, (1, 1), c)
        b, hh, ww, _ = y.shape
        if CK.convffn_fused_enabled(
            c, self.hidden, hh * ww, y.dtype.itemsize, train, self.lora_rank,
            batch=b,
        ):
            # Fused BN-affine + fc1 + LoRA + GELU + fc2 + LoRA: the hidden
            # tensor never hits HBM (ops/convffn.py). Batch statistics (and
            # the running-stat update) stay outside so autodiff carries the
            # exact BatchNorm train backward through them.
            bn = F.BNAffine(c, name="conv_bn")
            if train:
                mean, var, n = F.branch_stats(y)
                inv, shift = bn(mean, var, n, train=True)
            else:
                inv, shift = bn(train=False)
            p, s_lora = self._fused_params(inv, shift, c, b, train)
            out = CK.dispatch_convffn(y.reshape(b, hh * ww, c), p, s_lora)
            return out.reshape(b, hh, ww, c)
        if F.ffn_fold_active(train):
            # Fold the post-depthwise BN affine into the fc1 1x1 kernel (and
            # the LoRA A via in_affine): fc1(y*inv + shift) =
            # conv(y, K*inv) + (b + shift @ K). The normalised activation is
            # never materialised — one fewer elementwise pass over (B,H,W,C).
            bn = F.BNAffine(c, name="conv_bn")
            if train:
                my, m2y, n = F.channel_moments(y)
                inv, shift = bn(my, m2y - jnp.square(my), n, train=True)
            else:
                inv, shift = bn(train=False)
            k1, b1 = F.DenseConvParams(self.hidden, (1, 1), name="fc1")(c)
            k1f = k1[0, 0].astype(jnp.float32)
            h = F.apply_folded(
                y, k1.astype(jnp.float32) * inv[:, None],
                b1.astype(jnp.float32) + shift @ k1f,
                strides=(1, 1), padding=(0, 0),
            )
            if self.lora_rank > 0:
                h = h + ConvLoRA(
                    self.lora_rank, self.lora_alpha, self.lora_dropout,
                    name="fc1_lora",
                )(y, self.hidden, deterministic=not train,
                  in_affine=(inv, shift))
        else:
            y = L.BatchNorm(name="conv_bn")(y, use_running_average=not train)
            h = L.Conv(self.hidden, kernel_size=(1, 1), name="fc1")(y)
            if self.lora_rank > 0:
                h = h + ConvLoRA(
                    self.lora_rank, self.lora_alpha, self.lora_dropout,
                    name="fc1_lora",
                )(y, self.hidden, deterministic=not train)
        h = nn.gelu(h, approximate=False)
        out = L.Conv(c, kernel_size=(1, 1), name="fc2")(h)
        if self.lora_rank > 0:
            out = out + ConvLoRA(
                self.lora_rank, self.lora_alpha, self.lora_dropout, name="fc2_lora"
            )(h, c, deterministic=not train)
        return out


class RepMixer(nn.Module):
    """Token mixing: x + ls * (mixer(x) - norm(x)); mixer = depthwise
    MobileOne (no act), norm = identity-BN branch only."""

    layer_scale_init: float

    @nn.compact
    def __call__(
        self, x: Array, *, train: bool, return_combine: bool = False
    ) -> Array:
        c = x.shape[-1]
        if return_combine:
            # Fused-pair path (FastViTBlock): return the UNAPPLIED mixer as
            # (a, b, bias, y0) with out = a*x + b*y0 + bias — the whole
            # RepMixer in reuse form is one materialised 3x3 depthwise
            # branch plus per-channel coefficients, so the combine can fuse
            # into the downstream segment kernel (ops/dwconv.py).
            if not (train and F.block_reuse_active(train)):
                raise ValueError("return_combine requires the reuse train mode")
            terms_m, xc_m, bias_m = MobileOneBlock(
                c, kernel_size=3, groups=c, use_act=False, name="mixer"
            )(x, train=True, return_terms=True)
            terms_n, xc_n, bias_n = MobileOneBlock(
                c, kernel_size=3, groups=c, use_act=False,
                use_scale_branch=False, num_conv_branches=0, name="norm",
            )(x, train=True, return_terms=True)
            if len(terms_m) != 1 or terms_n:
                raise ValueError(
                    "return_combine expects exactly one materialised mixer "
                    "branch (num_conv_branches=1) and a stats-only norm"
                )
            ls = self.param(
                "layer_scale", nn.initializers.constant(self.layer_scale_init), (c,)
            )
            lsf = ls.astype(jnp.float32)
            inv0, y0 = terms_m[0]
            a = 1.0 + lsf * (xc_m - xc_n)
            b = lsf * inv0
            bias = lsf * (bias_m - bias_n)
            return a, b, bias, y0
        if F.block_fold_active(train) and F.block_reuse_active(train):
            # Reuse form: the mixer's 3x3 depthwise branch output y0 is
            # materialised for its statistics; every other branch of mixer
            # and norm is a per-channel affine of x. The whole mixer is ONE
            # depthwise conv + one fused elementwise map:
            #   out = x*(1 + ls*(xc_m - xc_n)) + ls*inv0*y0 + ls*(b_m - b_n)
            terms_m, xc_m, bias_m = MobileOneBlock(
                c, kernel_size=3, groups=c, use_act=False, name="mixer"
            )(x, train=True, return_terms=True)
            terms_n, xc_n, bias_n = MobileOneBlock(
                c, kernel_size=3, groups=c, use_act=False,
                use_scale_branch=False, num_conv_branches=0, name="norm",
            )(x, train=True, return_terms=True)
            ls = self.param(
                "layer_scale", nn.initializers.constant(self.layer_scale_init), (c,)
            )
            lsf = ls.astype(jnp.float32)
            out = x.astype(jnp.float32) * (1.0 + lsf * (xc_m - xc_n)) + lsf * (
                bias_m - bias_n
            )
            for inv, y in terms_m:
                out = out + y.astype(jnp.float32) * (lsf * inv)
            for inv, y in terms_n:
                out = out - y.astype(jnp.float32) * (lsf * inv)
            return out.astype(x.dtype)
        if F.block_fold_active(train):
            # Whole-mixer fold: out = x + ls*(mixer(x) - norm(x)) with both
            # children folded to (kernel, bias) collapses to ONE depthwise
            # 3x3 conv — K = ls*(Km - Kn) + ident, b = ls*(bm - bn).
            km, bm = MobileOneBlock(
                c, kernel_size=3, groups=c, use_act=False, name="mixer"
            )(x, train=train, return_fold=True)
            kn, bn_ = MobileOneBlock(
                c, kernel_size=3, groups=c, use_act=False,
                use_scale_branch=False, num_conv_branches=0, name="norm",
            )(x, train=train, return_fold=True)
            ls = self.param(
                "layer_scale", nn.initializers.constant(self.layer_scale_init), (c,)
            )
            lsf = ls.astype(jnp.float32)
            ident = jnp.asarray(F._center_identity(3, 3, 1, c))
            k_tot = lsf * (km - kn) + ident
            b_tot = lsf * (bm - bn_)
            return F.apply_folded(
                x, k_tot, b_tot, strides=(1, 1), padding=(1, 1),
                feature_group_count=c,
            )
        mixed = MobileOneBlock(
            c, kernel_size=3, groups=c, use_act=False, name="mixer"
        )(x, train=train)
        normed = MobileOneBlock(
            c, kernel_size=3, groups=c, use_act=False,
            use_scale_branch=False, num_conv_branches=0, name="norm",
        )(x, train=train)
        ls = self.param(
            "layer_scale", nn.initializers.constant(self.layer_scale_init), (c,)
        )
        return x + ls * (mixed - normed)


class SpatialAttention(nn.Module):
    """MHSA over the flattened spatial grid (BN pre-norm, FastViT-style)."""

    head_dim: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        b, h, w, c = x.shape
        num_heads = max(1, c // self.head_dim)
        if F.ffn_fold_active(train):
            # Pre-norm fold: BN(x) @ W = x @ (inv[:, None] * W) + shift @ W.
            # Train-mode statistics are exact channel moments of x, so the
            # normalised tensor never hits HBM.
            bn = F.BNAffine(c, name="norm")
            if train:
                mx, m2x, n = F.channel_moments(x)
                inv, shift = bn(mx, m2x - jnp.square(mx), n, train=True)
            else:
                inv, shift = bn(train=False)
            wq = F.DenseParams(3 * c, name="qkv")(c)
            t = x.reshape(b, h * w, c)
            qkv = (
                t @ (inv[:, None] * wq.astype(jnp.float32)).astype(t.dtype)
                + (shift @ wq.astype(jnp.float32)).astype(t.dtype)
            )
        else:
            y = L.BatchNorm(name="norm")(x, use_running_average=not train)
            t = y.reshape(b, h * w, c)
            qkv = L.Dense(3 * c, use_bias=False, name="qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, h * w, num_heads, c // num_heads).transpose(0, 2, 1, 3)

        o = fused_attention(heads(q), heads(k), heads(v), scale=self.head_dim**-0.5)
        o = o.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        o = L.Dense(c, name="proj")(o)
        return o.reshape(b, h, w, c)


class FastViTBlock(nn.Module):
    mixer: str  # "repmixer" | "attention"
    mlp_ratio: float
    cfg: FastViTConfig

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        from dino_pose_tpu.ops import convffn as CK
        from dino_pose_tpu.ops import dwconv as DWK

        c = x.shape[-1]
        ls_init = self.cfg.layer_scale_init
        if self.mixer == "repmixer":
            bsz, hh, ww, _ = x.shape
            hidden = int(c * self.mlp_ratio)
            if (
                train
                and F.block_fold_active(train)
                and F.block_reuse_active(train)
                and DWK.pair_enabled(
                    c, hh, ww, 7, x.dtype.itemsize, batch=bsz
                )
                and CK.convffn_res_enabled(
                    c, hidden, hh * ww, x.dtype.itemsize, True,
                    self.cfg.lora_rank, batch=bsz,
                )
            ):
                # Fused-pair path: the whole RepMixer+ConvFFN residual pair
                # runs as two segment kernels around the batch-stat
                # barriers (see ConvFFN's pair branch).
                pair = RepMixer(ls_init, name="token_mixer")(
                    x, train=True, return_combine=True
                )
                ls2 = self.param(
                    "layer_scale_2", nn.initializers.constant(ls_init), (c,)
                )
                return ConvFFN(
                    hidden=hidden,
                    lora_rank=self.cfg.lora_rank,
                    lora_alpha=self.cfg.lora_alpha,
                    lora_dropout=self.cfg.lora_dropout,
                    name="mlp",
                )(x, train=True, pair=pair, ls2=ls2)
            x = RepMixer(ls_init, name="token_mixer")(x, train=train)
        else:
            ls1 = self.param("layer_scale_1", nn.initializers.constant(ls_init), (c,))
            x = x + ls1 * SpatialAttention(
                self.cfg.attn_head_dim, name="attn"
            )(x, train=train)
        ls2 = self.param("layer_scale_2", nn.initializers.constant(ls_init), (c,))
        x = x + ls2 * ConvFFN(
            hidden=int(c * self.mlp_ratio),
            lora_rank=self.cfg.lora_rank,
            lora_alpha=self.cfg.lora_alpha,
            lora_dropout=self.cfg.lora_dropout,
            name="mlp",
        )(x, train=train)
        return x


class FastViTBackbone(nn.Module):
    """stem -> 4 stages -> final SE conv; returns the NHWC feature map
    (B, H/32, W/32, 2 * embed_dims[-1])."""

    cfg: FastViTConfig

    @nn.compact
    def __call__(self, pixels_nhwc: Array, *, train: bool = False) -> Array:
        cfg = self.cfg
        d0 = cfg.embed_dims[0]
        x = MobileOneBlock(d0, 3, strides=2, name="stem0")(pixels_nhwc, train=train)
        x = MobileOneBlock(d0, 3, strides=2, groups=d0, name="stem1")(x, train=train)
        x = MobileOneBlock(d0, 1, strides=1, name="stem2")(x, train=train)

        for i, (dim, depth) in enumerate(zip(cfg.embed_dims, cfg.depths)):
            if i > 0:
                x = PatchEmbed(dim, name=f"downsample{i}")(x, train=train)
            if cfg.pos_embs[i]:
                x = RepCPE(name=f"pos_emb{i}")(x)
            for j in range(depth):
                x = FastViTBlock(
                    mixer=cfg.token_mixers[i],
                    mlp_ratio=cfg.mlp_ratios[i],
                    cfg=cfg,
                    name=f"stage{i}_block{j}",
                )(x, train=train)

        x = MobileOneBlock(
            cfg.out_channels, 3, strides=1, groups=cfg.embed_dims[-1],
            use_se=cfg.final_se, name="final_conv",
        )(x, train=train)
        return x


def fuse_mobileone_params(
    conv_kernel, conv_bn, scale_kernel=None, scale_bn=None, skip_bn=None, eps=1e-5
):
    """Algebraic branch fusion for deployment: returns (kernel kxk, bias).

    Each (conv, BN) branch folds to conv' = conv * gamma/sqrt(var+eps),
    bias' = beta - mean * gamma/sqrt(var+eps); the 1x1 scale branch zero-pads
    to kxk; the identity BN branch is a centred-dirac kxk conv. Branches sum.
    All arrays are HWIO numpy/JAX.
    """
    import numpy as np

    def fold(kernel, bn):
        gamma, beta = np.asarray(bn["scale"]), np.asarray(bn["bias"])
        mean, var = np.asarray(bn["mean"]), np.asarray(bn["var"])
        std = np.sqrt(var + eps)
        return kernel * (gamma / std), beta - mean * gamma / std

    k, b = fold(np.asarray(conv_kernel), conv_bn)
    kh = k.shape[0]
    if scale_kernel is not None:
        ks, bs = fold(np.asarray(scale_kernel), scale_bn)
        pad = kh // 2
        ks_full = np.zeros_like(k)
        ks_full[pad : pad + 1, pad : pad + 1] = ks
        k, b = k + ks_full, b + bs
    if skip_bn is not None:
        # Same centred-dirac construction as the train-time fold's skip
        # branch — they must stay identical for deploy-time fusion to match
        # trained behaviour.
        ident = F._center_identity(kh, kh, k.shape[2], k.shape[3])
        ki, bi = fold(ident, skip_bn)
        k, b = k + ki, b + bi
    return k, b
