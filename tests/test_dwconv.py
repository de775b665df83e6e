"""Lane-packed depthwise-conv kernel parity (ops/dwconv.py).

The kernel is XLA's stride-1 SAME grouped (depthwise, multiplier-1) conv
re-laid-out over the fused (W*C) lane axis; forward outputs and dx must
match ``lax.conv_general_dilated`` to fp tolerance, and the conv kernel's
cotangent must be exactly zero (frozen-backbone contract — every FastViT
backbone conv is frozen in every training mode, train/partition.py).

CPU runs the kernel in interpret mode (dispatch target != tpu); the
``force`` override makes the gate accept it so the model-path wiring
(``fastvit_fold.dw_branch_conv``) is also exercised off-TPU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from dino_pose_tpu.ops import dwconv as DW


def _xla(x, k, kk):
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(kk // 2, kk // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


@pytest.mark.parametrize(
    "shape,kk",
    [
        ((4, 16, 16, 48), 7),   # stage-0-like geometry, batch > g
        ((2, 8, 8, 48), 3),     # mixer kernel size
        ((3, 16, 8, 20), 3),    # W*C not a multiple of 128 (interpret-only)
        ((2, 8, 16, 76), 7),    # ma36 channel count
        ((1, 8, 8, 96), 7),     # stage-1 channel count
    ],
)
def test_forward_parity(shape, kk):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(kk, kk, 1, shape[-1])).astype(np.float32))
    np.testing.assert_allclose(
        DW.dw_conv_frozen(x, k), _xla(x, k, kk), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("kk", [3, 7])
def test_grad_parity_and_frozen_contract(kk):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 48)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(kk, kk, 1, 48)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    # Data-dependent cotangent so dx exercises the full chain.
    g_ref = jax.grad(lambda x_: jnp.vdot(_xla(x_, k, kk), ct))(x)
    g_k, g_kern = jax.grad(
        lambda x_, k_: jnp.vdot(DW.dw_conv_frozen(x_, k_), ct), argnums=(0, 1)
    )(x, k)
    np.testing.assert_allclose(g_k, g_ref, atol=2e-5, rtol=2e-5)
    assert not np.any(np.asarray(g_kern))  # frozen contract: exactly zero


def test_gate_windows():
    # DEFAULT OFF (measured 26% in-situ regression for solo dispatch).
    assert not DW.dwconv_enabled(48, 64, 64, 7, 2, batch=8)
    # 'on' is TPU-only; off-TPU it stays ineligible even in-window.
    os.environ["DINO_POSE_TPU_DWCONV"] = "on"
    try:
        assert not DW.dwconv_enabled(48, 64, 64, 7, 2, batch=8)
    finally:
        os.environ.pop("DINO_POSE_TPU_DWCONV", None)
    os.environ["DINO_POSE_TPU_DWCONV"] = "force"
    try:
        assert DW.dwconv_enabled(48, 64, 64, 7, 2, batch=8)
    finally:
        os.environ.pop("DINO_POSE_TPU_DWCONV", None)
    os.environ["DINO_POSE_TPU_DWCONV"] = "xla"
    try:
        assert not DW.dwconv_enabled(48, 64, 64, 7, 2, batch=8)
    finally:
        os.environ.pop("DINO_POSE_TPU_DWCONV", None)


def test_model_path_parity():
    """dw_branch_conv routes through the kernel under force and matches the
    XLA branch conv inside the real reuse-path signature."""
    from dino_pose_tpu.models import fastvit_fold as F

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 48)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 48)).astype(np.float32))
    ref = F.dw_branch_conv(x, k, (1, 1), 48)  # gate rejects off-TPU -> XLA
    os.environ["DINO_POSE_TPU_DWCONV"] = "force"
    try:
        got = F.dw_branch_conv(x, k, (1, 1), 48)
    finally:
        os.environ.pop("DINO_POSE_TPU_DWCONV", None)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_sharded_dispatch_parity():
    """Pure-DP shard_map route on the 8-device CPU mesh: same values and
    same dx as the single-device kernel."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dino_pose_tpu.core.mesh import create_mesh
    from dino_pose_tpu.ops import dispatch

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 48)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 48)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    ref = _xla(x, k, 3)
    g_ref = jax.grad(lambda x_: jnp.vdot(_xla(x_, k, 3), ct))(x)

    os.environ["DINO_POSE_TPU_DWCONV"] = "force"
    try:
        with dispatch.scoped():
            mesh = create_mesh()
            xs = jax.device_put(x, NamedSharding(mesh, P("data")))
            out = jax.jit(DW.dispatch_dw_conv)(xs, k)
            np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
            g = jax.jit(
                jax.grad(lambda x_: jnp.vdot(DW.dispatch_dw_conv(x_, k), ct))
            )(xs)
            np.testing.assert_allclose(g, g_ref, atol=2e-5, rtol=2e-5)
    finally:
        os.environ.pop("DINO_POSE_TPU_DWCONV", None)


def _combine_ref(x, y0, a, b_, bias, k, kk):
    x2f = (x.astype(jnp.float32) * a + y0.astype(jnp.float32) * b_ + bias)
    x2 = x2f.astype(x.dtype)
    return x2, _xla(x2, k, kk)


@pytest.mark.parametrize("shape,kk", [((3, 16, 16, 48), 7), ((2, 8, 8, 20), 3)])
def test_combine_dw_forward_parity(shape, kk):
    rng = np.random.default_rng(4)
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    y0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    b_ = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(kk, kk, 1, c)).astype(np.float32))
    x2_ref, y7_ref = _combine_ref(x, y0, a, b_, bias, k, kk)
    x2, y7 = DW.combine_dw_frozen(x, y0, a, b_, bias, k)
    np.testing.assert_allclose(x2, x2_ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(y7, y7_ref, atol=5e-5, rtol=5e-5)


def test_combine_dw_grad_parity():
    rng = np.random.default_rng(5)
    c, kk = 48, 7
    x = jnp.asarray(rng.normal(size=(2, 16, 16, c)).astype(np.float32))
    y0 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    b_ = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(kk, kk, 1, c)).astype(np.float32))
    ct2 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    ct7 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def loss_ref(x_, y0_, a_, bb_, bias_):
        x2, y7 = _combine_ref(x_, y0_, a_, bb_, bias_, k, kk)
        return jnp.vdot(x2, ct2) + jnp.vdot(y7, ct7)

    def loss_k(x_, y0_, a_, bb_, bias_, k_):
        x2, y7 = DW.combine_dw_frozen(x_, y0_, a_, bb_, bias_, k_)
        return jnp.vdot(x2, ct2) + jnp.vdot(y7, ct7)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, y0, a, b_, bias)
    g_k = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5))(x, y0, a, b_, bias, k)
    for gr, gk, name in zip(g_ref, g_k, ("dx", "dy0", "da", "db", "dbias")):
        np.testing.assert_allclose(gk, gr, atol=3e-4, rtol=3e-4, err_msg=name)
    assert not np.any(np.asarray(g_k[5]))  # frozen conv kernel


def test_combine_dw_sharded_parity():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dino_pose_tpu.core.mesh import create_mesh
    from dino_pose_tpu.ops import dispatch

    rng = np.random.default_rng(6)
    c, kk = 48, 3
    x = jnp.asarray(rng.normal(size=(8, 8, 8, c)).astype(np.float32))
    y0 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    b_ = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(kk, kk, 1, c)).astype(np.float32))
    x2_ref, y7_ref = _combine_ref(x, y0, a, b_, bias, k, kk)

    os.environ["DINO_POSE_TPU_STAGE_PAIR"] = "force"
    try:
        with dispatch.scoped():
            mesh = create_mesh()
            sh = NamedSharding(mesh, P("data"))
            xs, y0s = jax.device_put(x, sh), jax.device_put(y0, sh)
            x2, y7 = jax.jit(DW.dispatch_combine_dw)(xs, y0s, a, b_, bias, k)
            np.testing.assert_allclose(x2, x2_ref, atol=2e-5, rtol=2e-5)
            np.testing.assert_allclose(y7, y7_ref, atol=5e-5, rtol=5e-5)
    finally:
        os.environ.pop("DINO_POSE_TPU_STAGE_PAIR", None)
