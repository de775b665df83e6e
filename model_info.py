#!/usr/bin/env python3
"""Root-level wrapper matching the reference repo's CLI layout."""

from dino_pose_tpu.cli.model_info import main

if __name__ == "__main__":
    main()
