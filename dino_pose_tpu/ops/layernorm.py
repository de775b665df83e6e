"""Fused LayerNorm kernel.

Profiling the train step on TPU v5e (dinov2-small, bs=128) showed XLA's
layer-norm fusions costing ~1.07 ms each — ~12 ms/step across the backbone,
an effective ~47 GB/s on tensors a fused pass should stream at near memory
bandwidth. This kernel does one VMEM-resident pass per row block: load bf16,
compute float32 statistics, scale/shift, store bf16.

The backward pass recomputes through the plain jnp formulation (flash-style
rematerialisation). In this framework gradients cross at most two LayerNorms
(the final norm and the last block's norm2 on the LoRA path), so the
recompute cost is negligible next to the forward saving.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 512  # rows per program: 512 x D float32 working set stays tiny


def layernorm_reference(x, scale, bias, eps: float):
    """Plain jnp formulation (float32 stats, input-dtype output)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (R, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _pallas_layernorm(x, scale, bias, eps: float):
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = x.size // d
    x2 = x.reshape(rows, d)
    pad = (-rows) % _ROWS
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = x2.shape[0] // _ROWS
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x2, scale, bias)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x, scale, bias, eps: float = 1e-6):
    return _pallas_layernorm(x, scale, bias, eps)


def _fwd(x, scale, bias, eps):
    return _pallas_layernorm(x, scale, bias, eps), (x, scale, bias)


def _bwd(eps, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(lambda x_, s_, b_: layernorm_reference(x_, s_, b_, eps), x, scale, bias)
    return vjp(g)


fused_layernorm.defvjp(_fwd, _bwd)
