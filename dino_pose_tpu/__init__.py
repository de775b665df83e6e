"""dino_pose_tpu — a TPU-native (JAX / XLA / Pallas / pjit) pose-estimation framework.

Re-implements the capabilities of the PyTorch reference `seungjoohan/dino_pose`
(mounted read-only at /root/reference) as a from-scratch, idiomatic-JAX design:

- Vision-Transformer (DINOv2) and FastViT backbones in Flax with fused Pallas
  attention kernels (`dino_pose_tpu.ops`).
- Spatial-aware heatmap + z-coordinate pose heads (`dino_pose_tpu.models.heads`).
- LoRA adapters for both families (`dino_pose_tpu.models.lora`).
- A COCO keypoint data pipeline whose geometric augmentations + Gaussian heatmap
  rendering run on device as one fused, vmapped program (`dino_pose_tpu.data`).
- A pjit train step (data-parallel over an ICI mesh, optional tensor parallelism)
  with dynamic loss weighting carried in the jitted train state
  (`dino_pose_tpu.train`).
- Orbax checkpoints plus a PyTorch `.pth` bridge that keeps exported checkpoints
  weight-compatible with the reference for CoreML conversion parity
  (`dino_pose_tpu.io`).
"""

__version__ = "0.1.0"
