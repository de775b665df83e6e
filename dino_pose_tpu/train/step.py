"""The pjit train/eval steps.

Design: one jitted function per mode; the whole :class:`TrainState` is donated
(buffers reused in place), the batch arrives sharded over the mesh ``data``
axis, parameters are replicated (pure DP — the BASELINE north-star config) and
XLA inserts the gradient all-reduce automatically from the shardings. Batch
statistics are synchronised across replicas for free because the batch-axis
reductions inside BatchNorm are global reductions over a sharded axis.

Loss semantics match /root/reference/train.py:122-202: training minimises the
EMA-balanced loss, validation reports ``kp + weight * z`` in eval mode (running
BN stats, no dropout).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dino_pose_tpu.train import weighting
from dino_pose_tpu.train.losses import keypoint_loss, z_loss
from dino_pose_tpu.train.state import TrainState

Array = jax.Array


def make_train_step(module, tx, partition) -> Callable:
    def train_step(state: TrainState, batch: dict, lr: Array, rng: Array):
        rng = jax.random.fold_in(rng, state.step)
        confidence = batch["2d_keypoints"][..., 2]
        trainable0, frozen = partition.split(state.params)

        def loss_fn(trainable):
            # Differentiate only wrt the trainable subtree: XLA never builds
            # the backward graph below the deepest trainable parameter.
            params = partition.merge(trainable, frozen)
            (pred_hm, pred_z), mutated = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            kp_l = keypoint_loss(pred_hm, batch["2d_heatmaps"], confidence)
            z_l = z_loss(pred_z, batch["z_coords"], confidence)
            lw = weighting.update(state.loss_weight, kp_l, z_l)
            loss = weighting.balanced_loss(lw, kp_l, z_l)
            return loss, (kp_l, z_l, lw, mutated["batch_stats"])

        (loss, (kp_l, z_l, lw, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable0)

        updates, new_opt_state = tx.update(grads, state.opt_state, trainable0)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_trainable = optax.apply_updates(trainable0, updates)
        new_params = partition.merge(new_trainable, frozen)

        kp_c, z_c = weighting.loss_contributions(lw, kp_l, z_l)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            loss_weight=lw,
        )
        stats = {
            "loss": loss,
            "kp_loss": kp_l,
            "z_loss": z_l,
            "kp_contrib": kp_c,
            "z_contrib": z_c,
            "weight": lw.weight,
        }
        return new_state, stats

    return train_step


def make_eval_step(module) -> Callable:
    def eval_step(state: TrainState, batch: dict):
        # Optional (B,) 0/1 mask from data.dataset.pad_batch: evaluation runs
        # with drop_last=False, so the tail batch arrives zero-padded to the
        # static batch shape and padded samples must not dilute the loss.
        sample_valid = batch.get("sample_valid")
        confidence = batch["2d_keypoints"][..., 2]
        pred_hm, pred_z = module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"],
            train=False,
        )
        kp_l = keypoint_loss(pred_hm, batch["2d_heatmaps"], confidence, sample_valid)
        z_l = z_loss(pred_z, batch["z_coords"], confidence, sample_valid)
        loss = weighting.validation_loss(state.loss_weight, kp_l, z_l)
        return {
            "loss": loss,
            "kp_loss": kp_l,
            "z_loss": z_l,
            "pred_heatmaps": pred_hm,
            "pred_z": pred_z,
        }

    return eval_step




def _prepare_batch(
    step_fn: Callable,
    device_targets: tuple[int, int] | None,
    compute_dtype=None,
) -> Callable:
    """In-jit batch preparation: optionally render Gaussian heatmap targets
    from the (B, K, 3) keypoints (the host never materialises or transfers
    the (B, K, hs, hs) target tensor — SURVEY §7 step 4) and cast the pixels
    to the compute dtype (bf16 on TPU) so the MXU runs at full rate while
    targets/losses stay float32."""
    from dino_pose_tpu.data.heatmaps import render_heatmaps

    def wrapped(state, batch, *rest):
        batch = dict(batch)
        if "canvas" in batch:
            # Device-warp fast path: the batch carries letterboxed uint8
            # canvases + per-sample affines; materialise pixels on device.
            from dino_pose_tpu.data.warp import warp_batch

            if device_targets is None:
                # Device-warp loaders never carry '2d_heatmaps' — without
                # device_targets nothing would render them and the step
                # crashes later on the missing key. Fail with the cause.
                raise ValueError(
                    "device_warp batches require device_targets=(input, "
                    "heatmap) so targets render in-step"
                )
            batch["image"] = warp_batch(
                batch.pop("canvas"),
                batch.pop("affine"),
                batch.pop("pad_color"),
                batch.pop("src_wh"),
                batch.pop("occ"),
                batch.pop("f3_affine"),
                batch.pop("f2_affine"),
                batch.pop("frame"),
                model_input=device_targets[0],
            )
        if device_targets is not None:
            input_size, heatmap_size = device_targets
            batch["2d_heatmaps"] = render_heatmaps(
                batch["2d_keypoints"],
                height=input_size,
                width=input_size,
                heatmap_size=heatmap_size,
            )
        if compute_dtype is not None:
            batch["image"] = batch["image"].astype(compute_dtype)
        return step_fn(state, batch, *rest)

    return wrapped


def jit_train_step(
    module,
    tx,
    partition,
    mesh: Mesh | None = None,
    *,
    device_targets: tuple[int, int] | None = None,
    compute_dtype=None,
):
    """jit the train step, donating the state; shard the batch if given a mesh.

    ``device_targets=(input_size, heatmap_size)`` fuses heatmap-target
    rendering into the step (batches then carry keypoints, not heatmaps);
    ``compute_dtype`` casts pixels in-jit (bf16 activations on TPU).
    """
    step = make_train_step(module, tx, partition)
    # Always wrapped: a device-warp ('canvas') batch without device_targets
    # must fail with the explanatory ValueError, not a KeyError mid-model.
    step = _prepare_batch(step, device_targets, compute_dtype)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    replicated = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(replicated, batch_sh, replicated, replicated),
        out_shardings=(replicated, replicated),
    )


def jit_eval_step(
    module,
    mesh: Mesh | None = None,
    *,
    device_targets: tuple[int, int] | None = None,
    compute_dtype=None,
):
    step = make_eval_step(module)
    step = _prepare_batch(step, device_targets, compute_dtype)
    if mesh is None:
        return jax.jit(step)
    replicated = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(replicated, batch_sh))
