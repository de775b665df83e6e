"""Observability utilities: StepTimer accounting, NaN-check toggle."""

import time

import jax
import jax.numpy as jnp
import pytest

from dino_pose_tpu.utils.profiling import StepTimer, enable_nan_checks


def test_step_timer_accounting():
    timer = StepTimer()

    def slow_loader():
        for _ in range(3):
            time.sleep(0.02)
            yield jnp.ones((4,))

    out = None
    for batch in timer.iter(slow_loader()):
        with timer.step():
            out = batch * 2
    timer.drain(out)
    s = timer.summary()
    assert s["steps"] == 3
    assert s["input_wait_s"] >= 0.05
    assert s["input_bound"] is True


def test_nan_checks_toggle():
    enable_nan_checks(True)
    try:
        with pytest.raises(FloatingPointError):
            jnp.asarray(0.0) / jnp.asarray(0.0)
    finally:
        enable_nan_checks(False)
    # back off: no raise
    jax.block_until_ready(jnp.asarray(0.0) / jnp.asarray(0.0))
