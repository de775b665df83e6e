"""Observability utilities: profiler traces, step timing, NaN debugging."""

from dino_pose_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    enable_nan_checks,
    trace,
)
