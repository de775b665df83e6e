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


def test_flash_backward_multi_chunk():
    """The Pallas backward rematerialises per q-chunk; a shape whose padded
    length forces several chunks must still match the XLA gradients."""
    from dino_pose_tpu.ops.attention import _bwd_chunk

    rng = np.random.default_rng(4)
    s, d = 200, 64  # padded to 256 -> two 128-row chunks
    sp, chunk = _bwd_chunk(s)
    assert sp == 256 and chunk == 128 and sp // chunk == 2
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 2, s, d)), jnp.float32) for _ in range(3)
    )
    scale = d**-0.5
    gf = jax.grad(lambda *a: jnp.sum(flash_attention(*a, scale) ** 2), (0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: jnp.sum(xla_attention(*a, scale) ** 2), (0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4, rtol=1e-3)


def test_shape_aware_dispatch_guards():
    """Long sequences: fused block must report 'does not fit VMEM', and the
    attention dispatch must pick the flash kernel on TPU targets only."""
    from dino_pose_tpu.ops import dispatch
    from dino_pose_tpu.ops.attention import FLASH_MIN_SEQ
    from dino_pose_tpu.ops.block import _rows_per_program, fused_blocks_enabled

    # dinov2-small at 518 input: S=1370 -> one batch row exceeds VMEM.
    assert _rows_per_program(1376, 384, 2) == 0
    # At the production S=257 it fits.
    assert _rows_per_program(264, 384, 2) >= 1

    old = dispatch._DISPATCH
    try:
        dispatch._DISPATCH = ("tpu", 1)
        assert fused_blocks_enabled(384, 257)
        assert not fused_blocks_enabled(384, 1370)  # falls back to unfused
        assert FLASH_MIN_SEQ <= 1370  # ...whose attention picks flash
        dispatch._DISPATCH = ("cpu", 8)
        assert not fused_blocks_enabled(384, 257)
    finally:
        dispatch._DISPATCH = old


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
