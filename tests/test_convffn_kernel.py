"""Fused ConvFFN kernel parity (ops/convffn.py).

The kernel is the ConvFFN chain (BN-as-affine -> fc1 + ConvLoRA -> GELU ->
fc2 + ConvLoRA) rearranged into one VMEM pass; outputs, input/LoRA/BN
gradients, and running-stat updates must match the branch-form module
(reference math: timm ConvFFN + /root/reference/model/lora.py:68-149) to fp
tolerance, with the SAME parameter tree. Base fc1/fc2 cotangents are zeros
by the frozen-backbone contract (lora.py:151-166) — asserted explicitly.

CPU runs the kernels in interpret mode via DINO_POSE_TPU_CONVFFN=force.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_pose_tpu.models.fastvit import ConvFFN
from dino_pose_tpu.ops import convffn as CK


def _apply(mode, module, variables, x, *, train, rngs=None):
    os.environ["DINO_POSE_TPU_CONVFFN"] = mode
    try:
        if train:
            return module.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs=rngs or {},
            )
        return module.apply(variables, x, train=False), None
    finally:
        os.environ.pop("DINO_POSE_TPU_CONVFFN", None)


def _make(rank, c=16, seed=0, shape=(2, 8, 8, 16), dropout=0.0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    m = ConvFFN(hidden=3 * c, lora_rank=rank, lora_alpha=16.0, lora_dropout=dropout)
    variables = m.init(jax.random.key(seed), x, train=False)
    if rank:
        # lora_B is zero-init; give it mass so its gradient path is real.
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: v + 0.01
            if any(getattr(k, "key", None) == "lora_B" for k in p)
            else v,
            variables["params"],
        )
        variables = {**variables, "params": params}
    return m, variables, x


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("rank", [0, 8])
def test_forward_and_stats_parity(train, rank):
    m, variables, x = _make(rank)
    out_ref, mut_ref = _apply("xla", m, variables, x, train=train)
    out_k, mut_k = _apply("force", m, variables, x, train=train)
    np.testing.assert_allclose(out_k, out_ref, atol=2e-6, rtol=2e-6)
    if train:
        for key in ("mean", "var"):
            np.testing.assert_allclose(
                mut_k["batch_stats"]["conv_bn"][key],
                mut_ref["batch_stats"]["conv_bn"][key],
                atol=1e-6, rtol=1e-6,
            )


def test_gradient_parity_and_frozen_contract():
    m, variables, x = _make(rank=8)
    bs = variables["batch_stats"]

    def loss(params, x, mode):
        os.environ["DINO_POSE_TPU_CONVFFN"] = mode
        try:
            out, _ = m.apply(
                {"params": params, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
        finally:
            os.environ.pop("DINO_POSE_TPU_CONVFFN", None)
        w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape))
        return jnp.sum(out * w)

    gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(variables["params"], x, "xla")
    gp_k, gx_k = jax.grad(loss, argnums=(0, 1))(variables["params"], x, "force")

    np.testing.assert_allclose(gx_k, gx_ref, atol=5e-6, rtol=5e-6)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(gp_ref))
    flat_k = dict(jax.tree_util.tree_leaves_with_path(gp_k))
    for path, ref in flat_ref.items():
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        got = flat_k[path]
        if name.startswith(("fc1/", "fc2/")):
            # Frozen-backbone contract: zero cotangents for the base fc1/fc2.
            assert float(jnp.max(jnp.abs(got))) == 0.0, name
        else:
            # conv (via dy), conv_bn (via the affine + batch statistics),
            # and every LoRA adapter: exact.
            scale = max(1.0, float(jnp.max(jnp.abs(ref))))
            np.testing.assert_allclose(
                got, ref, atol=2e-5 * scale, rtol=2e-5, err_msg=name
            )


def test_dropout_mechanics():
    m, variables, x = _make(rank=8, dropout=0.5)
    rngs = {"dropout": jax.random.key(3)}
    out_a, _ = _apply("force", m, variables, x, train=True, rngs=rngs)
    out_b, _ = _apply(
        "force", m, variables, x, train=True, rngs={"dropout": jax.random.key(4)}
    )
    out_det, _ = _apply("force", m, variables, x, train=False)
    # Different draws differ; eval ignores dropout entirely (deterministic
    # forward equals the rate-0 train-mode function up to BN statistics).
    assert float(jnp.max(jnp.abs(out_a - out_b))) > 1e-4
    m0, v0, _ = _make(rank=8, dropout=0.0)
    out_nodrop, _ = _apply("force", m0, variables, x, train=True, rngs=rngs)
    assert float(jnp.max(jnp.abs(out_a - out_nodrop))) > 1e-4
    assert out_det.shape == out_a.shape


def test_gate_semantics():
    # Train without LoRA trains the base fc1/fc2 -> kernel ineligible.
    assert not CK.convffn_fused_enabled(48, 144, 4096, 2, True, 0, batch=8)
    # Off-TPU without the force hook: ineligible. Use an in-window channel
    # count (96) so this rejection exercises the platform check specifically
    # rather than falling at the 64 <= C <= 256 window first.
    assert not CK.convffn_fused_enabled(96, 288, 4096, 2, True, 8, batch=8)
    # The measured win window (64 <= C <= 256) applies on the real dispatch
    # path but NOT under force (the A/B/microbench hook must reach every
    # stage) — window channels stay eligible under force, others too.
    os.environ["DINO_POSE_TPU_CONVFFN"] = "force"
    try:
        assert CK.convffn_fused_enabled(96, 288, 1024, 2, True, 8, batch=8)
        assert CK.convffn_fused_enabled(384, 1152, 64, 2, True, 8, batch=8)
    finally:
        os.environ.pop("DINO_POSE_TPU_CONVFFN", None)
    os.environ["DINO_POSE_TPU_CONVFFN"] = "force"
    try:
        assert CK.convffn_fused_enabled(48, 144, 4096, 2, True, 8, batch=8)
        # Absurd widths must be rejected by the VMEM model, not crash later.
        assert not CK.convffn_fused_enabled(
            4096, 16384, 65536, 4, True, 8, batch=8
        )
    finally:
        os.environ.pop("DINO_POSE_TPU_CONVFFN", None)
    os.environ["DINO_POSE_TPU_CONVFFN"] = "xla"
    try:
        assert not CK.convffn_fused_enabled(48, 144, 4096, 2, False, 8, batch=8)
    finally:
        os.environ.pop("DINO_POSE_TPU_CONVFFN", None)


def test_row_padding_path():
    # S not a multiple of 8 exercises the pad/unpad route end to end.
    m, variables, x = _make(rank=8, shape=(2, 5, 5, 16))
    out_ref, _ = _apply("xla", m, variables, x, train=True)
    out_k, _ = _apply("force", m, variables, x, train=True)
    np.testing.assert_allclose(out_k, out_ref, atol=2e-6, rtol=2e-6)


def test_sharded_dp_parity():
    """fused_convffn_sharded on the 8-device CPU mesh: batch and dropout
    masks shard over 'data'; outputs and LoRA gradients match the local
    kernel."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(1)
    b, s, c, h, r = 8, 16, 16, 48, 4
    y = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    p = CK.ConvFFNParams(
        inv=jnp.asarray(rng.normal(size=(c,)).astype(np.float32)),
        shift=jnp.asarray(rng.normal(size=(c,)).astype(np.float32)),
        w1=jnp.asarray(rng.normal(size=(c, h)).astype(np.float32)) * 0.1,
        b1=jnp.zeros((h,), jnp.float32),
        w2=jnp.asarray(rng.normal(size=(h, c)).astype(np.float32)) * 0.1,
        b2=jnp.zeros((c,), jnp.float32),
        a1=jnp.asarray(rng.normal(size=(c, r)).astype(np.float32)) * 0.1,
        b1l=jnp.asarray(rng.normal(size=(r, h)).astype(np.float32)) * 0.1,
        a2=jnp.asarray(rng.normal(size=(h, r)).astype(np.float32)) * 0.1,
        b2l=jnp.asarray(rng.normal(size=(r, c)).astype(np.float32)) * 0.1,
        m1=jnp.ones((b, r), jnp.float32),
        m2=jnp.ones((b, r), jnp.float32),
    )

    os.environ["DINO_POSE_TPU_CONVFFN"] = "force"
    try:
        local = fused = CK.fused_convffn(y, p, 2.0)
        sharded = CK.fused_convffn_sharded(y, p, 2.0, mesh)
        np.testing.assert_allclose(sharded, local, atol=1e-6, rtol=1e-6)

        def loss(pp, yy, fn):
            return jnp.sum(jnp.square(fn(yy, pp)))

        g_local = jax.grad(loss)(p, y, lambda yy, pp: CK.fused_convffn(yy, pp, 2.0))
        g_shard = jax.grad(loss)(
            p, y, lambda yy, pp: CK.fused_convffn_sharded(yy, pp, 2.0, mesh)
        )
        for name in ("a1", "b1l", "a2", "b2l", "inv", "shift"):
            np.testing.assert_allclose(
                getattr(g_shard, name), getattr(g_local, name),
                atol=1e-5, rtol=1e-5, err_msg=name,
            )
    finally:
        os.environ.pop("DINO_POSE_TPU_CONVFFN", None)
