"""FastViT tensor-parallel sharding rules on a ('data', 'model') CPU mesh.

FASTVIT_TP_RULES shard the matmul-shaped parameters only (ConvFFN 1x1
fc1/fc2 column/row splits, attention-stage qkv/proj); everything spatial
replicates. Sharding is layout, not math — XLA must insert the collectives
that keep one train step bit-comparable (to fp tolerance) with the fully
replicated run, and the rules must actually engage (non-vacuity check).
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dino_pose_tpu.core.mesh import MeshSpec, create_mesh
from dino_pose_tpu.core.sharding import (
    FASTVIT_TP_RULES,
    tp_rules_for_family,
    tree_shardings,
)
from dino_pose_tpu.models import registry
from dino_pose_tpu.ops import dispatch
from dino_pose_tpu.train.state import create_train_state
from dino_pose_tpu.train.step import make_train_step

pytestmark = pytest.mark.slow  # two pjit train-step compiles on the CPU mesh

BATCH, SIZE = 8, 128


def _run_step(mesh, rules):
    config = {
        "model_name": "test/fastvit-tiny",
        "num_keypoints": 24,
        "output_heatmap_size": 48,
        "use_lora": True,
        "lora_rank": 4,
        "lora_dropout": 0.0,
    }
    model = registry.create_model_from_config(config, pretrained=False)
    state, tx, partition = create_train_state(model.variables, config, model.family)

    state_sh = tree_shardings(state, mesh, rules=rules)
    state = jax.device_put(state, state_sh)

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((BATCH, 3, SIZE, SIZE)).astype(np.float32),
        "2d_heatmaps": rng.random((BATCH, 24, 48, 48)).astype(np.float32),
        "2d_keypoints": rng.uniform(0, SIZE, (BATCH, 24, 3)).astype(np.float32),
        "z_coords": rng.standard_normal((BATCH, 24)).astype(np.float32),
    }
    batch = jax.device_put(batch, NamedSharding(mesh, P("data")))

    step = jax.jit(
        make_train_step(model.module, tx, partition),
        in_shardings=(state_sh, NamedSharding(mesh, P("data")), None, None),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
    )
    key = jax.device_put(jax.random.key(0), NamedSharding(mesh, P()))
    lr = jax.device_put(np.float32(1e-3), NamedSharding(mesh, P()))
    new_state, stats = step(state, batch, lr, key)
    jax.block_until_ready(new_state)
    return new_state, stats, state_sh


def test_family_rule_selection():
    assert tp_rules_for_family("fastvit") is FASTVIT_TP_RULES
    assert tp_rules_for_family("dinov2")  # ViT table non-empty
    assert tp_rules_for_family("unknown-family") == []


def test_fastvit_tp_step_matches_replicated():
    with dispatch.scoped():
        mesh = create_mesh(MeshSpec(dp=4, tp=2))
        sharded, stats_tp, state_sh = _run_step(mesh, FASTVIT_TP_RULES)

        # Non-vacuity: fc1/fc2 and qkv/proj leaves must actually be sharded
        # over 'model' on this mesh.
        specs = jax.tree_util.tree_leaves_with_path(state_sh)
        model_sharded = [
            p for p, sh in specs
            if any("model" in str(ax) for ax in sh.spec)
        ]
        joined = ["/".join(str(getattr(k, "key", k)) for k in p) for p in model_sharded]
        assert any("fc1" in p for p in joined), joined[:5]
        assert any("qkv" in p for p in joined), joined[:5]

        replicated, stats_dp, _ = _run_step(mesh, [])

    np.testing.assert_allclose(
        float(stats_tp["loss"]), float(stats_dp["loss"]), rtol=1e-5
    )
    flat_tp = jax.tree_util.tree_leaves_with_path(jax.device_get(sharded.params))
    flat_dp = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(
            jax.device_get(replicated.params)
        )
    )
    checked = 0
    for p, v in flat_tp:
        ref = flat_dp[jax.tree_util.keystr(p)]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref), atol=2e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(p),
        )
        checked += 1
    assert checked > 50
