"""Device-mesh construction for data/tensor parallel training.

The framework scales over ICI with a 2-D logical mesh ``('data', 'model')``:
batch is sharded over ``data``; optionally attention heads / MLP hidden units
are sharded over ``model`` for the larger backbones (dinov2-large). XLA inserts
the all-reduces — there is no hand-written communication backend (the reference
has none either; it is single-device, /root/reference/train.py:236-242).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``dp * tp`` must equal the device count in use."""

    dp: int = 1
    tp: int = 1


def create_mesh(
    spec: MeshSpec | None = None, devices: Sequence[jax.Device] | None = None
) -> Mesh:
    """Build a ``('data', 'model')`` mesh.

    With no spec, all visible devices go to the data axis (pure DP — the
    configuration the BASELINE north-star asks for).
    """
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(dp=len(devices), tp=1)
    if spec.dp * spec.tp != len(devices):
        raise ValueError(
            f"Mesh {spec.dp}x{spec.tp} needs {spec.dp * spec.tp} devices, "
            f"got {len(devices)}"
        )
    dev_array = None
    if spec.tp > 1:
        # ICI-aware layout: device enumeration order need not follow the
        # physical torus on multi-chip slices, and a raw reshape can put a
        # tensor-parallel group on non-neighbouring chips — every
        # per-layer psum then rides slow links. mesh_utils picks a
        # topology-aware assignment; fall back to the plain reshape for
        # device subsets it cannot handle (e.g. hand-picked test subsets).
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(
                (spec.dp, spec.tp), devices=devices
            )
        except Exception:  # noqa: BLE001 — any topology failure -> reshape
            dev_array = None
    if dev_array is None:
        dev_array = np.asarray(devices).reshape(spec.dp, spec.tp)
    mesh = Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
    # Pallas dispatch (ops/block.py) must know the platform the next traces
    # execute on: mesh devices can be a non-default platform (e.g. the
    # multichip dryrun's virtual-CPU mesh while the TPU plugin is default).
    from dino_pose_tpu.ops.block import configure_for_mesh

    configure_for_mesh(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-example arrays: leading axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
