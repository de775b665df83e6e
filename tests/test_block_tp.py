"""Tensor-parallel fused split halves on a ('data', 'model') CPU mesh.

Each model shard runs the fused half kernel (interpret mode off-TPU) on its
Megatron weight slice — local head columns for attention, local fc1
columns / fc2 rows for the MLP — and one psum per half stitches the
residual branch. Values and (LoRA-relevant) gradients must match the
unsharded unfused math.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_pose_tpu.core.mesh import MeshSpec, create_mesh
from dino_pose_tpu.ops import dispatch
from dino_pose_tpu.ops.block import (
    AttnParams,
    MlpParams,
    attn_part_math,
    attn_part_tp,
    dispatch_attn_part,
    dispatch_mlp_part,
    mlp_part_math,
    mlp_part_tp,
    parts_fused_enabled,
)

D, H, S, B = 128, 4, 57, 8  # S not a multiple of 8; H divides over tp=2
EPS = 1e-6


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(3)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    ap = AttnParams(
        g1=1 + r(D), b1=r(D), wqkv=r(D, 3 * D), bqkv=r(3 * D),
        wo=r(D, D), bo=r(D),
    )
    mp = MlpParams(
        g2=1 + r(D), b2=r(D), w1=r(D, 4 * D), bf1=r(4 * D),
        w2=r(4 * D, D), bf2=r(D), ls2=1 + r(D),
    )
    x = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32))
    return ap, mp, x


@pytest.fixture()
def tp_mesh():
    with dispatch.scoped():
        yield create_mesh(MeshSpec(dp=4, tp=2))


def test_attn_part_tp_matches_math(params, tp_mesh):
    ap, _, x = params
    y_tp = jax.jit(lambda x_, ap_: attn_part_tp(x_, ap_, H, EPS, tp_mesh))(x, ap)
    y_ref = attn_part_math(x, ap, num_heads=H, eps=EPS)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_mlp_part_tp_matches_math(params, tp_mesh):
    _, mp, x = params
    y_tp = jax.jit(
        lambda x_, mp_: mlp_part_tp(x_, mp_, EPS, True, tp_mesh)
    )(x, mp)
    y_ref = mlp_part_math(x, mp, eps=EPS)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_mlp_tp_frozen_adapter_gradient(params, tp_mesh):
    """The LoRA contract: gradients flow through dx2 (an upstream adapter
    scale here) while the frozen MLP weights get zero cotangents."""
    _, mp, x = params
    a0 = jnp.float32(1.0)

    def loss_tp(a, mp_):
        return jnp.sum(jnp.square(mlp_part_tp(x * a, mp_, EPS, True, tp_mesh)))

    def loss_ref(a, mp_):
        return jnp.sum(jnp.square(mlp_part_math(x * a, mp_, eps=EPS)))

    ga_tp, gmp_tp = jax.jit(jax.grad(loss_tp, argnums=(0, 1)))(a0, mp)
    ga_ref, gmp_ref = jax.grad(loss_ref, argnums=(0, 1))(a0, mp)
    np.testing.assert_allclose(np.asarray(ga_tp), np.asarray(ga_ref),
                               atol=5e-3, rtol=1e-3)
    # Frozen-weight contract: interior weight cotangents are zeroed; the
    # external bf2/ls2 (outside the kernel) stay exact.
    assert float(jnp.abs(gmp_tp.w1).max()) == 0.0
    assert float(jnp.abs(gmp_tp.w2).max()) == 0.0
    for name in ("bf2", "ls2"):
        np.testing.assert_allclose(
            np.asarray(getattr(gmp_tp, name)),
            np.asarray(getattr(gmp_ref, name)),
            atol=5e-3, rtol=1e-3, err_msg=name,
        )


def test_dispatch_routes_tp(params, tp_mesh):
    """dispatch_attn_part / dispatch_mlp_part pick the TP route on a
    model-axis mesh (no silent fall-through to unfused XLA math: the gate
    admits the shape, and the result still matches)."""
    ap, mp, x = params
    assert os.environ.get("DINO_POSE_TPU_BLOCK") is None
    os.environ["DINO_POSE_TPU_BLOCK"] = "parts"
    try:
        assert parts_fused_enabled(D, S, 4, H)
        y_a = jax.jit(
            lambda x_, ap_: dispatch_attn_part(x_, ap_, H, EPS)
        )(x, ap)
        y_m = jax.jit(
            lambda x_, mp_: dispatch_mlp_part(x_, mp_, EPS, True)
        )(y_a, mp)
    finally:
        os.environ.pop("DINO_POSE_TPU_BLOCK", None)
    ref_a = attn_part_math(x, ap, num_heads=H, eps=EPS)
    ref_m = mlp_part_math(y_a, mp, eps=EPS)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(ref_a),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(ref_m),
                               atol=1e-5, rtol=1e-5)


def test_tp_gate_rejects_indivisible_heads(tp_mesh):
    """Heads that do not divide over 'model' must not engage the TP route."""
    assert not parts_fused_enabled(96, S, 2, 3)  # 3 heads over tp=2
    # and without num_heads the TP branch cannot be taken at all
    assert not parts_fused_enabled(768, S, 2, None)
