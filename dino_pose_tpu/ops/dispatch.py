"""Trace-time kernel-dispatch target.

Pallas kernels must decide compiled-vs-interpret (and whether to run at
all) at trace time, and ``jax.default_backend()`` is the WRONG signal when
the computation targets devices of a non-default platform — e.g. the
multichip dryrun builds a virtual-CPU mesh while the TPU plugin stays the
default backend. Mesh-aware callers (``core.mesh.create_mesh``) record the
platform/device count here; mesh-less single-chip paths fall back to the
default backend.
"""

from __future__ import annotations

import jax

_DISPATCH: tuple[str, int] | None = None
_MESH = None


def configure_for_mesh(mesh) -> None:
    """Record the platform/device-count the next traces will execute on."""
    global _DISPATCH, _MESH
    dev = mesh.devices.flat[0]
    _DISPATCH = (dev.platform, mesh.devices.size)
    _MESH = mesh


def target() -> tuple[str, int]:
    """(platform, device_count) the next traced computation runs on."""
    if _DISPATCH is not None:
        return _DISPATCH
    return jax.default_backend(), jax.device_count()


def target_mesh():
    """The mesh the next traces execute on, or None for mesh-less paths."""
    return _MESH


def local():
    """Context manager pinning the dispatch target to ONE local device.

    Host-local computations (dataset eval, CLI inference) must not inherit
    a multi-host training mesh: tracing their blocks through the global
    ``shard_map`` would emit cross-process collectives and produce
    non-addressable outputs for per-process inputs. Inside this scope the
    kernels trace exactly as single-chip programs; the previous target is
    restored on exit.
    """
    import contextlib

    @contextlib.contextmanager
    def _scope():
        global _DISPATCH, _MESH
        prev = (_DISPATCH, _MESH)
        _DISPATCH = (jax.local_devices()[0].platform, 1)
        _MESH = None
        try:
            yield
        finally:
            _DISPATCH, _MESH = prev

    return _scope()


def scoped():
    """Context manager restoring the dispatch target on exit.

    The target is process-global mutable state set by whichever
    ``create_mesh`` ran last; long-lived processes that train on a mesh and
    then run mesh-less single-chip work (or tests building transient
    meshes) must not inherit a stale multi-device target — e.g. single-chip
    inference after a multichip mesh would silently lose the fused kernels.
    Wrap the mesh-owning computation; traces after the block see whatever
    target was configured before it.
    """
    import contextlib

    @contextlib.contextmanager
    def _scope():
        global _DISPATCH, _MESH
        prev = (_DISPATCH, _MESH)
        try:
            yield
        finally:
            _DISPATCH, _MESH = prev

    return _scope()
