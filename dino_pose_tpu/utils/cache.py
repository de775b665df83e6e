"""Persistent XLA compilation cache for CLI entry points.

Compiling the flagship train/eval programs through the single-chip tunnel
costs minutes per process; the reference's ``torch.compile`` pays the same
price per run (/root/reference/train.py:256-273). JAX can persist compiled
executables to disk, collapsing repeat compiles of identical programs
across processes — every CLI and ``fit`` call this before building any jit
program. Tests configure their own cache dir (tests/conftest.py).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/dino_pose_tpu/xla")


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotent; respects an existing user-configured cache location."""
    import jax

    try:
        if jax.config.jax_compilation_cache_dir:  # already configured
            return
    except AttributeError:  # very old jax without the option
        return
    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
