"""Fused TPU kernels (Pallas) with XLA fallbacks for CPU testing."""

from dino_pose_tpu.ops.attention import attention, xla_attention  # noqa: F401
