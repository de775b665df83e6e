"""Training CLI.

Flag-compatible with /root/reference/train.py:403-408 (``--config_file``),
except that here the flag actually works: the given Python file's
``get_default_configs()`` is loaded (the reference parses the flag but
imports its static config regardless).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train DINOv2 pose model")
    parser.add_argument(
        "--config_file",
        type=str,
        default="config/config.py",
        help="model training config file",
    )
    parser.add_argument(
        "--num_epochs", type=int, default=None,
        help="override config_training['num_epochs']",
    )
    parser.add_argument(
        "--no_pth_export", action="store_true",
        help="skip writing reference-schema .pth files next to checkpoints",
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from dino_pose_tpu.config import load_config_file
    from dino_pose_tpu.train.loop import fit

    config_dataset, config_training, config_preproc, config_model = load_config_file(
        args.config_file
    )
    fit(
        config_dataset,
        config_training,
        config_preproc,
        config_model,
        export_pth=not args.no_pth_export,
        num_epochs=args.num_epochs,
    )


if __name__ == "__main__":
    main()
