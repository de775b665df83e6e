"""Fused transformer-block kernel vs the unfused math (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_pose_tpu.ops.block import BlockParams, block_math, fused_block

D, H, S, B = 64, 2, 57, 4  # S deliberately not a multiple of 8
EPS = 1e-6


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(0)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    return BlockParams(
        g1=1 + r(D), b1=r(D), wqkv=r(D, 3 * D), bqkv=r(3 * D),
        wo=r(D, D), bo=r(D), ls1=1 + r(D), g2=1 + r(D), b2=r(D),
        w1=r(D, 4 * D), bf1=r(4 * D), w2=r(4 * D, D), bf2=r(D),
        ls2=1 + r(D),
    )


def test_fused_matches_unfused_f32(params):
    x = np.random.default_rng(1).standard_normal((B, S, D)).astype(np.float32)
    want = block_math(jnp.asarray(x), params, num_heads=H, eps=EPS)
    got = fused_block(jnp.asarray(x), params, H, EPS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_fused_matches_unfused_bf16(params):
    x = np.random.default_rng(2).standard_normal((B, S, D)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    want = block_math(xb, params, num_heads=H, eps=EPS)
    got = fused_block(xb, params, H, EPS)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_gradients_match_unfused(params):
    """The fallback VJP must give the exact unfused gradients (x AND params)."""
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, S, D)).astype(np.float32)
    )

    def loss_fused(x_, p_):
        return jnp.sum(jnp.square(fused_block(x_, p_, H, EPS)))

    def loss_unfused(x_, p_):
        return jnp.sum(jnp.square(block_math(x_, p_, num_heads=H, eps=EPS)))

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_u, gp_u = jax.grad(loss_unfused, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_u), atol=1e-4, rtol=1e-3)
    for a, b in zip(gp_f, gp_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_fused_block_train_forward_and_gradients(params):
    """The fully-fused training path (Pallas fwd + two-kernel Pallas bwd)
    must match block_math and its jax.vjp: input grad AND every parameter
    grad, with the batch-grid accumulation across multiple programs."""
    import jax
    from dino_pose_tpu.ops.block import fused_block_train

    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((3, S, D)).astype(np.float32)
    )  # 3 batch rows -> 3 sequential grid programs accumulate weight grads

    y_fused = fused_block_train(x, params, H, EPS)
    y_ref = block_math(x, params, num_heads=H, eps=EPS)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)

    def loss_fused(x_, p_):
        return jnp.sum(jnp.square(fused_block_train(x_, p_, H, EPS)))

    def loss_ref(x_, p_):
        return jnp.sum(jnp.square(block_math(x_, p_, num_heads=H, eps=EPS)))

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4, rtol=1e-3)
    for name, a, b in zip(gp_f._fields, gp_f, gp_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"param grad mismatch: {name}",
        )


def test_fused_block_sharded_matches_plain(params):
    """shard_map-wrapped fused block over an 8-device DP mesh (interpret
    mode) must match the single-program kernel and the unfused math."""
    import jax
    from dino_pose_tpu.core.mesh import create_mesh
    from dino_pose_tpu.ops.block import fused_block_sharded

    mesh = create_mesh()  # all 8 virtual CPU devices on the data axis
    assert mesh.devices.size == 8
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((8, S, D)).astype(np.float32)
    )
    want = block_math(x, params, num_heads=H, eps=EPS)
    got = jax.jit(
        lambda x_, p_: fused_block_sharded(x_, p_, H, EPS, mesh)
    )(x, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_fused_block_train_sharded_grads(params):
    """Trainable fused block under shard_map on the 8-device DP mesh:
    forward AND gradients must match the unsharded unfused math. The
    parameter cotangents cross the check_rep=False boundary only via the
    explicit psum — without it each shard would return 1/8 of the sum."""
    import jax
    from dino_pose_tpu.core.mesh import create_mesh
    from dino_pose_tpu.ops.block import fused_block_train_sharded

    mesh = create_mesh()
    assert mesh.devices.size == 8
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((8, S, D)).astype(np.float32)
    )

    def loss_sh(x_, p_):
        return jnp.sum(
            jnp.square(fused_block_train_sharded(x_, p_, H, EPS, mesh))
        )

    def loss_ref(x_, p_):
        return jnp.sum(jnp.square(block_math(x_, p_, num_heads=H, eps=EPS)))

    y_sh = jax.jit(lambda x_, p_: fused_block_train_sharded(x_, p_, H, EPS, mesh))(
        x, params
    )
    y_ref = block_math(x, params, num_heads=H, eps=EPS)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)

    gx_s, gp_s = jax.jit(jax.grad(loss_sh, argnums=(0, 1)))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               atol=2e-4, rtol=1e-3)
    for name, a, b in zip(gp_s._fields, gp_s, gp_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"param grad mismatch: {name}",
        )


def test_split_parts_sharded_grads(params):
    """LoRA split halves under shard_map: attention half + XLA adapter-like
    stitch + MLP half (frozen-weight backward) must match the unfused
    composition in value and input gradient on the 8-device DP mesh."""
    import jax
    from dino_pose_tpu.core.mesh import create_mesh
    from dino_pose_tpu.ops.block import (
        AttnParams, MlpParams, attn_part_math, mlp_part_math,
        fused_attn_part_sharded, fused_mlp_part_sharded,
    )

    mesh = create_mesh()
    ap = AttnParams(params.g1, params.b1, params.wqkv, params.bqkv,
                    params.wo, params.bo)
    mp = MlpParams(params.g2, params.b2, params.w1, params.bf1,
                   params.w2, params.bf2, params.ls2)
    x = jnp.asarray(
        np.random.default_rng(10).standard_normal((8, S, D)).astype(np.float32)
    )

    def f_sharded(x_):
        o = fused_attn_part_sharded(x_, ap, H, EPS, mesh)
        x2 = x_ + o * params.ls1
        return jnp.sum(jnp.square(
            fused_mlp_part_sharded(x2, mp, EPS, True, mesh)
        ))

    def f_ref(x_):
        o = attn_part_math(x_, ap, num_heads=H, eps=EPS)
        x2 = x_ + o * params.ls1
        return jnp.sum(jnp.square(mlp_part_math(x2, mp, eps=EPS)))

    np.testing.assert_allclose(
        float(jax.jit(f_sharded)(x)), float(f_ref(x)), rtol=1e-5
    )
    g_s = jax.jit(jax.grad(f_sharded))(x)
    g_r = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                               atol=2e-4, rtol=1e-3)


def test_dispatch_block_routes_by_mesh(params):
    """dispatch_block picks shard_map on multi-device targets, the plain
    kernel otherwise; fused_blocks_enabled admits pure-DP meshes only."""
    from dino_pose_tpu.core.mesh import MeshSpec, create_mesh
    from dino_pose_tpu.ops import dispatch
    from dino_pose_tpu.ops.block import fused_blocks_enabled

    old = (dispatch._DISPATCH, dispatch._MESH)
    try:
        dp_mesh = create_mesh()  # 8x1
        dispatch._DISPATCH = ("tpu", 8)  # pretend the mesh is TPU
        assert fused_blocks_enabled(384, 257)  # DP mesh: fused allowed
        create_mesh(MeshSpec(dp=4, tp=2))
        dispatch._DISPATCH = ("tpu", 8)
        assert not fused_blocks_enabled(384, 257)  # TP axis: unfused
    finally:
        dispatch._DISPATCH, dispatch._MESH = old


def test_dispatch_scoped_restores_target():
    """dispatch.scoped() must restore the previous trace target: a mesh
    built inside the scope (e.g. by fit) must not leak into later
    mesh-less single-chip traces (round-2 advisor, low)."""
    from dino_pose_tpu.core.mesh import create_mesh
    from dino_pose_tpu.ops import dispatch

    before = (dispatch._DISPATCH, dispatch._MESH)
    with dispatch.scoped():
        mesh = create_mesh()
        assert dispatch.target_mesh() is mesh
        assert dispatch.target()[1] == 8
    assert (dispatch._DISPATCH, dispatch._MESH) == before


def test_lora_split_kernels_match_legacy_path():
    """The LoRA block's split-fused route (fused attention half -> XLA
    adapter -> fused MLP half) must match the legacy module composition in
    value AND in adapter gradients (which flow through the MLP half's
    Pallas backward via dx2)."""
    import os

    import jax
    from dino_pose_tpu.models.vit import Block, ViTConfig

    cfg = ViTConfig(
        hidden_size=D, num_layers=2, num_heads=H,
        lora_layers=(1,), lora_rank=4, lora_alpha=8, lora_dropout=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, S, D)).astype(np.float32)
    )
    blk = Block(cfg, use_lora=True)
    v = blk.init(jax.random.key(0), x, deterministic=True)
    # Make the adapter non-trivial (lora_B inits to zero).
    v = jax.tree.map(
        lambda a: a + 0.01 if a.ndim == 2 and a.shape[0] == 4 else a, v
    )

    def loss(variables, fused):
        os.environ["DINO_POSE_TPU_BLOCK"] = "fused" if fused else "unfused"
        try:
            return jnp.sum(jnp.square(blk.apply(variables, x, deterministic=False)))
        finally:
            os.environ.pop("DINO_POSE_TPU_BLOCK", None)

    y_f = loss(v, True)
    y_u = loss(v, False)
    np.testing.assert_allclose(float(y_f), float(y_u), rtol=1e-5)

    g_f = jax.grad(loss)(v, True)["params"]["attention"]["lora_output"]
    g_u = jax.grad(loss)(v, False)["params"]["attention"]["lora_output"]
    for k in ("lora_A", "lora_B"):
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_u[k]), atol=2e-4, rtol=1e-3,
            err_msg=k,
        )


def test_block_module_routes_and_trees_match():
    """Module init trees are identical across fused/unfused routes, and the
    frozen (fused-eligible) route equals the legacy module path numerically."""
    import os

    from dino_pose_tpu.models.vit import Block, ViTConfig

    cfg = ViTConfig(hidden_size=D, num_layers=2, num_heads=H)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, S, D)).astype(np.float32)
    )
    frozen = Block(cfg, frozen=True)
    trainable = Block(cfg, frozen=False)
    vf = frozen.init(jax.random.key(0), x, deterministic=True)
    vt = trainable.init(jax.random.key(0), x, deterministic=True)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vt)
    flat_f = jax.tree_util.tree_leaves(vf)
    flat_t = jax.tree_util.tree_leaves(vt)
    for a, b in zip(flat_f, flat_t):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    os.environ["DINO_POSE_TPU_BLOCK"] = "fused"
    try:
        got = frozen.apply(vf, x, deterministic=True)
    finally:
        os.environ.pop("DINO_POSE_TPU_BLOCK", None)
    want = trainable.apply(vt, x, deterministic=False)  # block_math route
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_mlp_part_frozen_backward_dx2_exact(params):
    """The activation-only MLP backward must give the same dx2 as the full
    kernel (weight cotangents are zeroed by the frozen-weights contract)."""
    import jax
    from dino_pose_tpu.ops.block import MlpParams, fused_mlp_part

    mp = MlpParams(params.g2, params.b2, params.w1, params.bf1,
                   params.w2, params.bf2, params.ls2)
    x2 = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, S, D)).astype(np.float32)
    )

    def loss(x_, frozen):
        return jnp.sum(jnp.square(fused_mlp_part(x_, mp, EPS, frozen)))

    g_full = jax.grad(lambda x_: loss(x_, False))(x2)
    g_frozen = jax.grad(lambda x_: loss(x_, True))(x2)
    np.testing.assert_allclose(np.asarray(g_frozen), np.asarray(g_full),
                               atol=1e-5, rtol=1e-5)


def test_mlp_part_unfrozen_backward_non_default_ratio():
    """fused_mlp_part's trainable backward must not reach _mlp_bwd (whose
    grad accumulators are ratio-4 by construction) for other fc1 widths —
    the exact-vjp fallback keeps gradients correct."""
    from dino_pose_tpu.ops.block import MlpParams, fused_mlp_part, mlp_part_math

    d, h, s, b = 32, 96, 9, 2  # ratio 3
    rng = np.random.default_rng(11)
    r = lambda *sh: rng.standard_normal(sh).astype(np.float32) * 0.1
    mp = MlpParams(g2=1 + r(d), b2=r(d), w1=r(d, h), bf1=r(h),
                   w2=r(h, d), bf2=r(d), ls2=1 + r(d))
    x2 = jnp.asarray(r(b, s, d))

    f = lambda x_, mp_: jnp.sum(fused_mlp_part(x_, mp_, 1e-6) ** 2)
    g = lambda x_, mp_: jnp.sum(mlp_part_math(x_, mp_, eps=1e-6) ** 2)
    gx_f, gm_f = jax.grad(f, argnums=(0, 1))(x2, mp)
    gx_r, gm_r = jax.grad(g, argnums=(0, 1))(x2, mp)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=1e-5, rtol=1e-5)
    for a, b_ in zip(gm_f, gm_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-5)
