"""Fused RepMixer+ConvFFN pair-path parity (models/fastvit.py FastViTBlock).

The pair path runs the whole block as two segment kernels — combine+dw7
(ops/dwconv.py) and BN-affine+FFN+LoRA+residual (ops/convffn.py) — around
the two batch-stat barriers. Outputs, batch-stat updates and every
gradient the training partition can see must match the reuse-form branch
math; the mlp-side base weights (dw-conv kernel, fc1/fc2) get ZERO
cotangents by the frozen-backbone contract (train/partition.py: fastvit
trains pose heads + LoRA only), asserted explicitly.

CPU runs the kernels in interpret mode under the force overrides.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_pose_tpu.models import fastvit
from dino_pose_tpu.models.fastvit import ConvFFN, FastViTBlock, FastViTConfig

_FORCE = {"DINO_POSE_TPU_STAGE_PAIR": "force", "DINO_POSE_TPU_CONVFFN": "force"}


def _with_env(env, fn, *args, **kwargs):
    prev = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return fn(*args, **kwargs)
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _block(c=16, rank=4, dropout=0.0):
    cfg = FastViTConfig(
        embed_dims=(c,), depths=(1,), mlp_ratios=(3.0,),
        token_mixers=("repmixer",), pos_embs=(False,),
        lora_rank=rank, lora_dropout=dropout,
    )
    return FastViTBlock(mixer="repmixer", mlp_ratio=3.0, cfg=cfg)


def _init(m, x):
    return m.init(jax.random.key(0), x, train=False)


def _bump_lora_b(variables):
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.01
        if any(getattr(k, "key", None) == "lora_B" for k in p)
        else v,
        variables["params"],
    )
    return {**variables, "params": params}


def _apply_train(m, variables, x):
    return m.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(7)},
    )


def test_pair_forward_and_stats_parity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 8, 16, 16)).astype(np.float32))
    m = _block()
    variables = _bump_lora_b(_init(m, x))
    out_ref, mut_ref = _apply_train(m, variables, x)
    out_k, mut_k = _with_env(_FORCE, _apply_train, m, variables, x)
    np.testing.assert_allclose(out_k, out_ref, atol=5e-5, rtol=5e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(mut_ref["batch_stats"])
    flat_k = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(mut_k["batch_stats"])
    }
    for p, v in flat_r:
        np.testing.assert_allclose(
            flat_k[jax.tree_util.keystr(p)], v, atol=1e-5, rtol=1e-5,
            err_msg=jax.tree_util.keystr(p),
        )


def test_pair_gradient_parity_and_frozen_contract():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))
    m = _block()
    variables = _bump_lora_b(_init(m, x))
    bs = variables["batch_stats"]

    def loss(params, x_):
        out, _ = m.apply(
            {"params": params, "batch_stats": bs}, x_, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(7)},
        )
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    g_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(variables["params"], x)
    g_k, gx_k = _with_env(
        _FORCE, jax.grad(loss, argnums=(0, 1)), variables["params"], x
    )
    np.testing.assert_allclose(gx_k, gx_ref, atol=5e-5, rtol=5e-5)

    flat_ref = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(g_ref)
    }
    flat_k = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(g_k)
    }
    frozen_zero = (
        "['mlp']['conv']['kernel']",
        "['mlp']['fc1']['kernel']", "['mlp']['fc1']['bias']",
        "['mlp']['fc2']['kernel']", "['mlp']['fc2']['bias']",
    )
    for key, v_ref in flat_ref.items():
        if key in frozen_zero:
            assert not np.any(np.asarray(flat_k[key])), key
        elif "layer_scale_2" in key:
            # ls2 folds into frozen (w2, b2) plus the visible b2l product:
            # only the b2l chain survives — ls2 is frozen in every FastViT
            # training mode, so the partial cotangent is never consumed.
            continue
        else:
            np.testing.assert_allclose(
                flat_k[key], v_ref, atol=5e-5, rtol=5e-5, err_msg=key
            )


def test_pair_trainable_subtree_gradients_exact():
    """The gradients the optimizer actually consumes (LoRA subtree) match
    through the pair path via the production partition split."""
    from dino_pose_tpu.train.partition import trainable_mask

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))
    m = _block()
    variables = _bump_lora_b(_init(m, x))
    bs = variables["batch_stats"]
    mask = trainable_mask(
        variables["params"], {"use_lora": True}, family="fastvit"
    )
    ks = jax.tree_util.keystr
    flat = {
        ks(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    }
    flat_mask = {
        ks(p): v for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    train_keys = sorted(k for k, v in flat_mask.items() if v)
    assert train_keys  # LoRA params exist

    def loss(trainable, x_):
        leaves = [
            trainable[ks(p)] if flat_mask[ks(p)] else v
            for p, v in jax.tree_util.tree_flatten_with_path(
                variables["params"]
            )[0]
        ]
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(variables["params"]), leaves
        )
        out, _ = m.apply(
            {"params": params, "batch_stats": bs}, x_, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(7)},
        )
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    trainable = {k: flat[k] for k in train_keys}
    g_ref = jax.grad(loss)(trainable, x)
    g_k = _with_env(_FORCE, jax.grad(loss), trainable, x)
    for k in train_keys:
        np.testing.assert_allclose(
            g_k[k], g_ref[k], atol=5e-5, rtol=5e-5, err_msg=k
        )


def test_pair_with_dropout_runs():
    """Dropout mask plumbing through the pair path traces and runs (mask
    VALUE parity is covered by the convffn kernel tests)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))
    m = _block(dropout=0.3)
    variables = _bump_lora_b(_init(m, x))
    out, _ = _with_env(_FORCE, _apply_train, m, variables, x)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_pair_param_tree_identical():
    """Init under force and init under the default path build the SAME
    parameter/stat tree (checkpoint compatibility)."""
    x = jnp.zeros((2, 8, 16, 16), jnp.float32)
    m = _block()
    v_ref = _init(m, x)
    v_k = _with_env(_FORCE, lambda: m.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=True,
    ))
    ref_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(v_ref)
    }
    k_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(v_k)
    }
    assert ref_paths == k_paths
