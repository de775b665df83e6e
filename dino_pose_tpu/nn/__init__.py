"""Neural-net building blocks (flax.linen) with PyTorch-parity semantics.

Everything runs NHWC (TPU-native layout); the PyTorch bridge in
``dino_pose_tpu.io.torch_bridge`` handles layout transposition so checkpoints
stay weight-compatible with the reference.
"""

from dino_pose_tpu.nn.layers import (  # noqa: F401
    BatchNorm,
    Conv,
    ConvTranspose,
    Dense,
    Dropout,
    cubic_resize_matrix,
    nearest_resize_matrix,
    bilinear_resize,
)
