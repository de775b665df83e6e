"""Core TPU plumbing: device mesh, sharding rules, precision policy."""

from dino_pose_tpu.core.mesh import MeshSpec, create_mesh  # noqa: F401
from dino_pose_tpu.core.precision import Policy, DEFAULT_POLICY  # noqa: F401
