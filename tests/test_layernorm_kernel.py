"""Fused LayerNorm kernel vs the plain jnp formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_pose_tpu.ops.layernorm import fused_layernorm, layernorm_reference


@pytest.mark.parametrize("shape", [(2, 257, 384), (5, 384), (1, 130, 512)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape) * 3 + 1, dtype)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.uniform(-1, 1, shape[-1]), jnp.float32)
    want = layernorm_reference(x, scale, bias, 1e-6)
    got = fused_layernorm(x, scale, bias, 1e-6)
    assert got.dtype == x.dtype
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol, rtol=tol
    )


def test_kernel_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 70, 128)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 128), jnp.float32)
    bias = jnp.asarray(rng.uniform(-1, 1, 128), jnp.float32)

    gf = jax.grad(lambda *a: jnp.sum(fused_layernorm(*a, 1e-6) ** 2), argnums=(0, 1, 2))(
        x, scale, bias
    )
    gr = jax.grad(
        lambda *a: jnp.sum(layernorm_reference(*a, 1e-6) ** 2), argnums=(0, 1, 2)
    )(x, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_flash_gate_rejects_oversized_sequences():
    """attention() must stay on XLA when the flash kernel's f32 score tile
    cannot fit VMEM (the old g=1 fallback shipped an uncompilable kernel)."""
    from dino_pose_tpu.ops.attention import _heads_per_program, flash_fits

    assert _heads_per_program(12, 264, 64, 2) >= 1
    assert flash_fits(1, 6, 257, 64, 2)
    # S=2032 padded: 4*sp^2 ~= 16.5 MB of f32 scores alone.
    assert _heads_per_program(12, 2032, 64, 2) == 0
    assert not flash_fits(1, 6, 2026, 64, 2)
