"""Tracing / profiling / debugging (SURVEY §5 auxiliary subsystems).

The reference has only wall-clock prints (train.py:123,195 there); this
module provides the TPU-native equivalents:

- :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
  compatible trace (op-level device timeline).
- :class:`StepTimer` — splits an input-bound training loop into *host wait*
  (time blocked on the data iterator) vs *device step* time, the first
  question for any throughput regression.
- :func:`enable_nan_checks` — ``jax_debug_nans``; the functional-JAX
  analogue of a race sanitizer for numerics (reference has none).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/prof'): step(...)``.

    View with TensorBoard's profile plugin or xprof.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    """Re-run any op producing NaN eagerly and raise with its location."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Input-wait vs device-step accounting for one epoch.

    Usage::

        timer = StepTimer()
        for batch in timer.iter(loader):
            with timer.step():
                state, stats = train_step(state, batch, ...)
        print(timer.summary())

    Device steps dispatch asynchronously; the *measured* step time is
    dispatch time unless the loop blocks, so the summary also reports the
    epoch's trailing ``block_until_ready`` drain. If ``input_wait`` dominates,
    the host pipeline is the bottleneck (raise loader workers / prefetch).
    """

    def __init__(self):
        self.input_wait = 0.0
        self.step_time = 0.0
        self.drain_time = 0.0
        self.steps = 0

    def iter(self, iterable):
        it = iter(iterable)
        while True:
            t0 = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                return
            self.input_wait += time.perf_counter() - t0
            yield batch

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.step_time += time.perf_counter() - t0
        self.steps += 1

    def drain(self, tree) -> None:
        t0 = time.perf_counter()
        jax.block_until_ready(tree)
        self.drain_time += time.perf_counter() - t0

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "input_wait_s": round(self.input_wait, 4),
            "dispatch_s": round(self.step_time, 4),
            "drain_s": round(self.drain_time, 4),
            "input_bound": self.input_wait > (self.step_time + self.drain_time),
        }
