"""Fused attention kernel vs the XLA reference formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_pose_tpu.ops.attention import flash_attention, xla_attention


@pytest.mark.parametrize("b,h,s,d", [(2, 6, 257, 64), (1, 2, 64, 32), (4, 4, 128, 64)])
def test_flash_matches_xla(b, h, s, d):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32) for _ in range(3)
    )
    scale = d**-0.5
    want = xla_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_gradients_match():
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 2, 65, 32)), jnp.float32) for _ in range(3)
    )
    scale = 32**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4, rtol=1e-3)


def test_padding_mask_is_exact():
    """Padded key positions must not leak probability mass."""
    rng = np.random.default_rng(2)
    s = 130  # pads to 256
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 1, s, 64)), jnp.float32) for _ in range(3)
    )
    got = flash_attention(q, k, v, 0.125)
    want = xla_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
