"""Train state: parameters, batch stats, optimizer state, loss-weight state.

One pytree, donated to the jitted step every iteration (no host round-trips;
the dynamic loss-weighting EMA lives on device, unlike the reference's
per-step ``.item()`` syncs at /root/reference/train.py:154-158).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dino_pose_tpu.train.partition import trainable_mask
from dino_pose_tpu.train.weighting import LossWeightState

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    loss_weight: LossWeightState


def make_optimizer(params: dict, config_model: dict, family: str, weight_decay: float):
    """AdamW (torch hyperparameters) on trainable params, zero elsewhere.

    The returned transform excludes the learning rate — the step multiplies
    updates by ``-lr`` so the epoch loop can drive ReduceLROnPlateau without
    rebuilding optimizer state.
    """
    mask = trainable_mask(params, config_model, family)
    labels = jax.tree.map(lambda m: "trainable" if m else "frozen", mask)
    adamw = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay),
    )
    return optax.multi_transform(
        {"trainable": adamw, "frozen": optax.set_to_zero()}, labels
    )


def create_train_state(
    variables: dict,
    config_model: dict,
    family: str,
    weight_decay: float = 1e-6,
    initial_loss_weight: float = 0.1,
) -> tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(variables["params"], config_model, family, weight_decay)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        loss_weight=LossWeightState.create(initial_loss_weight),
    )
    return state, tx
