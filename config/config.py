"""Default training configuration (reference-schema 4-dict format).

Edit the paths/values here or point ``train.py --config_file`` at your own copy;
any Python file defining ``get_default_configs() -> (dataset, training,
preproc, model)`` works.
"""

from dino_pose_tpu.config import Config, DatasetConfig, as_dicts


def get_default_configs():
    cfg = Config()
    cfg.dataset = DatasetConfig(
        train_images_dir="data/pose/train/images",
        train_annotation_json="data/pose/train/annotation.json",
        val_images_dir="data/pose/valid/images",
        val_annotation_json="data/pose/valid/annotation.json",
    )
    cfg.training.checkpoint_dir = "checkpoints/dinov2_hg_skip"
    return as_dicts(cfg)
