"""Train state: parameters, batch stats, optimizer state, loss-weight state.

One pytree, donated to the jitted step every iteration (no host round-trips;
the dynamic loss-weighting EMA lives on device, unlike the reference's
per-step ``.item()`` syncs at /root/reference/train.py:154-158).

Freezing design: parameters are split into trainable/frozen subtrees by
``trainable_mask`` and the loss is differentiated **only with respect to the
trainable subtree**. XLA therefore never builds the backward graph below the
deepest trainable parameter — a frozen-backbone fine-tune pays backbone
forward cost only (the reference relies on requires_grad=False for the same
effect). Optimizer state exists only for trainable parameters.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from dino_pose_tpu.train.partition import trainable_mask
from dino_pose_tpu.train.weighting import LossWeightState

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any          # full parameter tree (trainable + frozen)
    batch_stats: Any
    opt_state: Any       # optimizer state over the *trainable* subtree only
    loss_weight: LossWeightState


class ParamPartition:
    """Static split/merge between the full tree and its trainable subtree."""

    def __init__(self, params: dict, config_model: dict, family: str):
        mask = trainable_mask(params, config_model, family)
        flat_mask = traverse_util.flatten_dict(mask)
        self.trainable_paths = frozenset(p for p, m in flat_mask.items() if m)

    def split(self, params: dict) -> tuple[dict, dict]:
        flat = traverse_util.flatten_dict(params)
        t = {p: v for p, v in flat.items() if p in self.trainable_paths}
        f = {p: v for p, v in flat.items() if p not in self.trainable_paths}
        return traverse_util.unflatten_dict(t), traverse_util.unflatten_dict(f)

    def merge(self, trainable: dict, frozen: dict) -> dict:
        flat = dict(traverse_util.flatten_dict(frozen))
        flat.update(traverse_util.flatten_dict(trainable))
        return traverse_util.unflatten_dict(flat)


def make_optimizer(weight_decay: float) -> optax.GradientTransformation:
    """AdamW (torch hyperparameters) over the trainable subtree.

    Excludes the learning rate — the step multiplies updates by ``-lr`` so the
    epoch loop can drive ReduceLROnPlateau without rebuilding optimizer state
    (matching torch, the decayed weights are scaled by lr too).
    """
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay),
    )


def create_train_state(
    variables: dict,
    config_model: dict,
    family: str,
    weight_decay: float = 1e-6,
    initial_loss_weight: float = 0.1,
) -> tuple[TrainState, optax.GradientTransformation, ParamPartition]:
    partition = ParamPartition(variables["params"], config_model, family)
    tx = make_optimizer(weight_decay)
    trainable, _ = partition.split(variables["params"])
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(trainable),
        loss_weight=LossWeightState.create(initial_loss_weight),
    )
    return state, tx, partition
