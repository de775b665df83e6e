"""Visualisation: skeleton overlays, 3-D scatter, combined views."""

from dino_pose_tpu.viz.plots import (  # noqa: F401
    plot_keypoints,
    plot_3d_keypoints,
    plot_keypoints_combined,
    visualize_pose,
    fig_to_array,
)
