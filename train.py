#!/usr/bin/env python3
"""Train a pose model: ``python train.py --config_file config/config.py``.

Same invocation as the reference repo's root train.py.
"""

from dino_pose_tpu.cli.train import main

if __name__ == "__main__":
    main()
