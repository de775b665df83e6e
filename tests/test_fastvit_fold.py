"""Train-time reparameterisation fold parity (models/fastvit_fold.py).

The fold is the same function as the branch-form math rearranged (BN with
known batch statistics is affine), so outputs, gradients, and running-stat
updates must match the unfused modules to fp tolerance — in BOTH modes,
with the SAME parameter tree.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_pose_tpu.models.fastvit import (
    ConvFFN,
    MobileOneBlock,
    ReparamLargeKernelConv,
    RepMixer,
    SpatialAttention,
)


def _set_mode(mode):
    """mode: 'branch' (FOLD=0: literal branch math everywhere) | 'fold' |
    'reuse'. The latter two force the train-time MobileOne-family math AND
    the train-time FFN/attention BN folds (eval always folds when FOLD=1),
    so every fold arm stays covered regardless of the production defaults
    (train = reuse blocks + branch FFN, the measured-fastest grid point —
    fastvit_fold.train_block_mode / ffn_fold_active)."""
    os.environ["DINO_POSE_TPU_FASTVIT_FOLD"] = "0" if mode == "branch" else "1"
    if mode != "branch":
        os.environ["DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS"] = mode
        os.environ["DINO_POSE_TPU_FASTVIT_TRAIN_FFN"] = "fold"


def _clear_mode():
    os.environ.pop("DINO_POSE_TPU_FASTVIT_FOLD", None)
    os.environ.pop("DINO_POSE_TPU_FASTVIT_TRAIN_BLOCKS", None)
    os.environ.pop("DINO_POSE_TPU_FASTVIT_TRAIN_FFN", None)


def _init_and_apply(module, x, *, train, mode, seed=0):
    _set_mode(mode)
    try:
        variables = module.init(jax.random.key(seed), x, train=False)
        if train:
            out, mut = module.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return variables, out, mut["batch_stats"]
        return variables, module.apply(variables, x, train=False), None
    finally:
        _clear_mode()


CASES = [
    # (module, x_shape) — every branch combination FastViT instantiates
    (MobileOneBlock(16, 3, strides=1, groups=16), (2, 10, 10, 16)),  # dw+scale+skip
    (MobileOneBlock(16, 3, strides=2, groups=16), (2, 10, 10, 16)),  # dw+scale, s2
    (MobileOneBlock(8, 3, strides=2, groups=1), (2, 10, 10, 3)),  # stem0: dense scale
    (MobileOneBlock(16, 1, strides=1, groups=1), (2, 10, 10, 16)),  # 1x1+skip
    (MobileOneBlock(32, 3, strides=1, groups=16, use_se=True), (2, 8, 8, 16)),  # mult
    # Grouped-but-not-depthwise scale branch: statistics need the
    # materialised branch output (the fold_stats_branch fallback arm).
    (MobileOneBlock(16, 3, strides=1, groups=4), (2, 8, 8, 16)),
    (ReparamLargeKernelConv(24, 7, strides=2, groups=12, small_kernel=3),
     (2, 12, 12, 12)),
    (RepMixer(1e-2), (2, 10, 10, 16)),
    (ConvFFN(hidden=48), (2, 8, 8, 16)),  # BN -> fc1 fold
    (ConvFFN(hidden=48, lora_rank=4, lora_dropout=0.0), (2, 8, 8, 16)),
    (SpatialAttention(head_dim=8), (2, 6, 6, 16)),  # pre-norm -> qkv fold
]


@pytest.mark.parametrize("module,shape", CASES, ids=lambda v: str(v)[:40])
@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
@pytest.mark.parametrize("mode", ["fold", "reuse"])
def test_fold_matches_branch_math(module, shape, train, mode):
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(shape), jnp.float32
    )
    v_fold, out_fold, bs_fold = _init_and_apply(module, x, train=train, mode=mode)
    v_ref, out_ref, bs_ref = _init_and_apply(module, x, train=train, mode="branch")

    # Identical parameter trees (names, shapes, values: same init RNG paths).
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_fold, v_ref,
    )
    np.testing.assert_allclose(
        np.asarray(out_fold), np.asarray(out_ref), atol=2e-4, rtol=1e-4
    )
    if train:
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            ),
            bs_fold, bs_ref,
        )


@pytest.mark.parametrize("mode", ["fold", "reuse"])
def test_fold_gradients_match(mode):
    """dx and (trainable-relevant) parameter cotangents agree: the fold is
    the same function, so autodiff must give the same derivatives."""
    module = RepMixer(1e-2)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 8, 8, 16)), jnp.float32
    )
    _set_mode("branch")
    try:
        variables = module.init(jax.random.key(0), x, train=False)
    finally:
        _clear_mode()

    def loss(m, params, xin):
        _set_mode(m)
        try:
            out, _ = module.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xin, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.square(out))
        finally:
            _clear_mode()

    gp_f, gx_f = jax.grad(lambda p, xi: loss(mode, p, xi), argnums=(0, 1))(
        variables["params"], x
    )
    gp_r, gx_r = jax.grad(lambda p, xi: loss("branch", p, xi), argnums=(0, 1))(
        variables["params"], x
    )
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-3, rtol=1e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3
        ),
        gp_f, gp_r,
    )


def test_stride2_parity_backward_matches_autodiff():
    from dino_pose_tpu.models import fastvit_fold as F

    """The parity-decomposed dx for stride-2 depthwise(-multiplier) convs
    (fastvit_fold._dw_s2_conv_frozen) equals XLA's autodiff transpose, and
    the conv kernel cotangent is exactly zero (frozen contract)."""
    import numpy as np

    rng = np.random.default_rng(0)
    for (b, h, w, cin, mult, kk) in [
        (2, 8, 8, 4, 2, 7),    # PatchEmbed large branch shape class
        (2, 8, 12, 6, 2, 3),   # small branch, non-square
        (1, 16, 16, 5, 1, 3),  # multiplier 1 (stem1 class)
    ]:
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.normal(size=(kk, kk, 1, cin * mult)).astype(np.float32)
        )
        ct_shape = (b, h // 2, w // 2, cin * mult)
        ct = jnp.asarray(rng.normal(size=ct_shape).astype(np.float32))

        def ref(x_):
            y = jax.lax.conv_general_dilated(
                x_, k, (2, 2), [(kk // 2, kk // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=cin,
            )
            return jnp.vdot(y, ct)

        g_ref = jax.grad(ref)(x)
        g_k, g_kern = jax.grad(
            lambda x_, k_: jnp.vdot(F._dw_s2_conv_frozen(x_, k_), ct),
            argnums=(0, 1),
        )(x, k)
        np.testing.assert_allclose(g_k, g_ref, atol=2e-5, rtol=2e-5)
        assert not np.any(np.asarray(g_kern))


def test_dw_branch_conv_routes_stride2():
    from dino_pose_tpu.models import fastvit_fold as F

    """dw_branch_conv forwards identically through the stride-2 custom-vjp
    route and falls back to plain XLA when DINO_POSE_TPU_DS_BWD=0."""
    import os

    import numpy as np

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(7, 7, 1, 8)).astype(np.float32))
    got = F.dw_branch_conv(x, k, (2, 2), 4)
    os.environ["DINO_POSE_TPU_DS_BWD"] = "0"
    try:
        ref = F.dw_branch_conv(x, k, (2, 2), 4)
    finally:
        os.environ.pop("DINO_POSE_TPU_DS_BWD", None)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)
