"""Dynamic kp/z loss balancing, carried *inside* the jitted train state.

Reference semantics (/root/reference/train.py:17-87): EMA-tracked per-loss
averages (momentum 0.9), a weight EMA'd toward the kp/z ratio and clamped to
[1e-3, 10]; training minimises the ratio-normalised "balanced loss"
``kp/kp_avg + z/z_avg`` (denominators detached), validation reports
``kp + weight * z``. The reference drives this from Python with per-step
``.item()`` syncs; here the state is a JAX pytree updated inside the step, so
the accelerator never stalls on the host.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

Array = jax.Array

_MOMENTUM = 0.9
_ADJUST_RATE = 0.1
_MIN_WEIGHT = 1e-3
_MAX_WEIGHT = 10.0
_EPS = 1e-8


@flax.struct.dataclass
class LossWeightState:
    weight: Array
    kp_avg: Array
    z_avg: Array
    initialized: Array  # bool: averages seeded yet?
    best_weight: Array
    best_val_loss: Array

    @classmethod
    def create(cls, initial_weight: float = 0.1) -> "LossWeightState":
        # Distinct buffers (not one shared array): the whole state is donated
        # to the jitted step, and XLA rejects donating a buffer twice.
        return cls(
            weight=jnp.asarray(initial_weight, jnp.float32),
            kp_avg=jnp.asarray(0.0, jnp.float32),
            z_avg=jnp.asarray(0.0, jnp.float32),
            initialized=jnp.asarray(False),
            best_weight=jnp.asarray(initial_weight, jnp.float32),
            best_val_loss=jnp.asarray(jnp.inf, jnp.float32),
        )


def update(state: LossWeightState, kp_loss: Array, z_loss: Array) -> LossWeightState:
    """Training-step update of averages and weight (no-op on validation)."""
    kp = jax.lax.stop_gradient(kp_loss)
    z = jax.lax.stop_gradient(z_loss)
    kp_avg = jnp.where(state.initialized, _MOMENTUM * state.kp_avg + (1 - _MOMENTUM) * kp, kp)
    z_avg = jnp.where(state.initialized, _MOMENTUM * state.z_avg + (1 - _MOMENTUM) * z, z)
    target = (kp + _EPS) / (z + _EPS)
    weight = jnp.clip(
        (1 - _ADJUST_RATE) * state.weight + _ADJUST_RATE * target,
        _MIN_WEIGHT,
        _MAX_WEIGHT,
    )
    return state.replace(
        weight=weight, kp_avg=kp_avg, z_avg=z_avg, initialized=jnp.asarray(True)
    )


def balanced_loss(state: LossWeightState, kp_loss: Array, z_loss: Array) -> Array:
    """Training objective; ``state`` must already be updated this step."""
    normalized = kp_loss / (state.kp_avg + _EPS) + z_loss / (state.z_avg + _EPS)
    fallback = kp_loss + state.weight * z_loss
    return jnp.where(state.initialized, normalized, fallback)


def validation_loss(state: LossWeightState, kp_loss: Array, z_loss: Array) -> Array:
    return kp_loss + state.weight * z_loss


def loss_contributions(state: LossWeightState, kp_loss: Array, z_loss: Array):
    kp_c = jnp.where(state.initialized, kp_loss / (state.kp_avg + _EPS), kp_loss)
    z_c = jnp.where(state.initialized, z_loss / (state.z_avg + _EPS), state.weight * z_loss)
    return kp_c, z_c


def update_best(state: LossWeightState, val_loss: Array) -> LossWeightState:
    """Track the weight that achieved the best validation loss (epoch level)."""
    better = val_loss < state.best_val_loss
    return state.replace(
        best_val_loss=jnp.where(better, val_loss, state.best_val_loss),
        best_weight=jnp.where(better, state.weight, state.best_weight),
    )
