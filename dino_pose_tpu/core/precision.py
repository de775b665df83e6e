"""Mixed-precision policy.

TPU MXU wants bfloat16 inputs; parameters, optimizer state and loss stay in
float32. The policy is threaded through the models so tests can run everything
in float32 on CPU while production runs bf16 on TPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def policy_for_backend(backend: str | None = None) -> Policy:
    """bf16 compute on TPU, f32 elsewhere (CPU tests stay deterministic)."""
    backend = backend or jax.default_backend()
    return DEFAULT_POLICY if backend == "tpu" else FP32_POLICY
