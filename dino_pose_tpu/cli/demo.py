"""Inference demo CLI — images, videos and GIFs.

Flag-compatible with /root/reference/demo.py:206-238 (``--input``,
``--model``, ``--output``, ``--plot_mode {2d,3d,combined}``, ``--show_info``,
``--max_frames``, ``--fps``, deprecated ``--image``). TPU-first difference:
video frames are batched through one jitted forward (chunks of
``--batch_size``) instead of the reference's one-frame-per-forward loop
(demo.py:76-110), so inference is amortised and only the matplotlib
rendering stays per-frame on the host.
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np

VIDEO_EXTENSIONS = {".mp4", ".avi", ".mov", ".mkv", ".wmv", ".flv", ".webm", ".m4v"}
GIF_EXTENSIONS = {".gif"}


def _str2bool(v: str) -> bool:
    if v.lower() in ("true", "1", "yes", "y"):
        return True
    if v.lower() in ("false", "0", "no", "n", ""):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def is_video_file(file_path) -> bool:
    return pathlib.Path(file_path).suffix.lower() in VIDEO_EXTENSIONS | GIF_EXTENSIONS


def extract_frames(video_path, max_frames=None):
    """Frames of a video/GIF as PIL images."""
    from PIL import Image

    frames = []
    if str(video_path).lower().endswith(".gif"):
        import imageio

        for i, frame in enumerate(imageio.mimread(video_path)):
            if max_frames and i >= max_frames:
                break
            frames.append(Image.fromarray(frame).convert("RGB"))
        return frames

    import cv2

    cap = cv2.VideoCapture(str(video_path))
    while True:
        ret, frame = cap.read()
        if not ret or (max_frames and len(frames) >= max_frames):
            break
        frames.append(Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)))
    cap.release()
    return frames


def get_video_fps(video_path) -> float:
    if str(video_path).lower().endswith(".gif"):
        return 10.0
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    fps = cap.get(cv2.CAP_PROP_FPS)
    cap.release()
    return fps if fps > 0 else 25.0


def make_predictor(model):
    """One jitted forward over (B, 3, S, S) -> host numpy heatmaps/z."""
    import jax

    fwd = jax.jit(lambda v, x: model.module.apply(v, x, train=False))
    variables = jax.device_put(model.variables)  # ship params once

    def predict(pixel_batch: np.ndarray):
        hm, z = fwd(variables, pixel_batch)
        return np.asarray(hm), np.asarray(z)

    return predict


def render_figure(image, heatmaps, z, plot_mode, keypoint_label):
    from dino_pose_tpu import viz

    if plot_mode == "3d":
        return viz.plot_3d_keypoints(image, heatmaps, z, keypoint_label=keypoint_label)
    if plot_mode == "combined":
        return viz.plot_keypoints_combined(image, heatmaps, z, keypoint_label=keypoint_label)
    return viz.plot_keypoints(image, heatmaps, keypoint_label=keypoint_label)


def process_single_image(image, predict, preprocessor, args):
    import matplotlib

    if args.output:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pixels = preprocessor(image)["pixel_values"]
    heatmaps, z = predict(pixels)
    fig = render_figure(image, heatmaps[0], z[0], args.plot_mode, args.keypoint_label)
    if args.output:
        fig.savefig(args.output, bbox_inches="tight", dpi=100)
        print(f"Visualization saved to {args.output}")
    else:
        plt.show()
    plt.close(fig)


def process_video(frames, predict, preprocessor, args, input_fps):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dino_pose_tpu.viz import fig_to_array

    # Video always renders in 2d (matching demo.py:303-306).
    plot_mode = "2d"
    out_frames = []
    bs = args.batch_size
    for start in range(0, len(frames), bs):
        chunk = frames[start : start + bs]
        pixels = preprocessor(chunk)["pixel_values"]
        heatmaps, z = predict(_pad_to(pixels, bs))
        for j, frame in enumerate(chunk):
            fig = render_figure(frame, heatmaps[j], z[j], plot_mode, args.keypoint_label)
            out_frames.append(fig_to_array(fig))
            plt.close(fig)
        print(f"Processed {min(start + bs, len(frames))}/{len(frames)} frames")

    if not out_frames:
        raise SystemExit(
            f"Could not read any frames from {args.input} — unreadable, "
            "corrupt, or missing-codec video (cv2.VideoCapture returned "
            "no frames)."
        )
    # Unify frame sizes (matplotlib can produce off-by-a-few differences).
    h = min(f.shape[0] for f in out_frames)
    w = min(f.shape[1] for f in out_frames)
    out_frames = [f[:h, :w] for f in out_frames]
    fps = args.fps or input_fps
    save_video(out_frames, args.output, fps)


def _pad_to(pixels: np.ndarray, batch: int) -> np.ndarray:
    if len(pixels) == batch:
        return pixels
    pad = np.zeros((batch - len(pixels), *pixels.shape[1:]), pixels.dtype)
    return np.concatenate([pixels, pad])


def save_video(frames, output_path, fps):
    output_path = str(output_path)
    if output_path.lower().endswith(".gif"):
        import imageio

        imageio.mimsave(output_path, frames, duration=1000.0 / max(fps, 1e-6))
    else:
        import cv2

        h, w = frames[0].shape[:2]
        writer = cv2.VideoWriter(
            output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
    print(f"Video saved to {output_path}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="DINOv2 Keypoint Detection Demo - Supports images, videos, and GIFs"
    )
    parser.add_argument("--input", type=str, required=False,
                        help="Path to input image, video, or gif")
    parser.add_argument("--model", type=str, default="facebook/dinov2-base",
                        help="Path to model checkpoint or DINOv2 model name")
    parser.add_argument("--num_keypoints", type=int, default=24,
                        help="Number of keypoints to detect (only used for pretrained models)")
    parser.add_argument("--output", type=str, default=None,
                        help="Path to save visualization output (image/video/gif)")
    parser.add_argument("--threshold", type=float, default=0.5,
                        help="Confidence threshold for keypoint visualization")
    # The reference declares type=bool here (demo.py:218), under which ANY
    # non-empty value — including the string 'False' — parses as True; a
    # wrong CLI parser is a usability bug, not an interchange contract, so
    # parse real booleans while accepting the same spellings.
    parser.add_argument("--keypoint_label", type=_str2bool, nargs="?",
                        const=True, default=False,
                        help="Whether to show keypoint labels in visualization")
    parser.add_argument("--show_info", action="store_true",
                        help="Show model information before inference")
    parser.add_argument("--plot_mode", type=str, choices=["2d", "3d", "combined"],
                        default="combined",
                        help="Visualization mode: 2d, 3d, or combined")
    parser.add_argument("--max_frames", type=int, default=None,
                        help="Maximum number of frames to process (for videos/gifs)")
    parser.add_argument("--fps", type=float, default=None,
                        help="Output FPS for video/gif (defaults to input FPS)")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="Frames per jitted forward for video inference")
    parser.add_argument("--image", type=str, default=None,
                        help="(Deprecated) Use --input instead")
    return parser


def main(argv=None) -> None:
    from dino_pose_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    if args.image and not args.input:
        args.input = args.image
        print("Warning: --image is deprecated, use --input instead")
    if not args.input:
        raise SystemExit("--input is required")

    from dino_pose_tpu.data.preprocess import create_preprocessor
    from dino_pose_tpu.io.checkpoint import get_model_info, load_model_smart
    from dino_pose_tpu.models.registry import resolve_model_name

    if args.show_info and args.input and args.model.endswith((".pth", ".msgpack")):
        info = get_model_info(args.model)
        print("Model info:")
        for k, v in info.items():
            print(f"  {k}: {v}")

    model = load_model_smart(args.model)
    preprocessor = create_preprocessor(resolve_model_name(model.model_name))
    predict = make_predictor(model)

    if is_video_file(args.input):
        frames = extract_frames(args.input, args.max_frames)
        print(f"Extracted {len(frames)} frames")
        if not args.output:
            raise SystemExit("--output is required for video/gif inputs")
        process_video(frames, predict, preprocessor, args, get_video_fps(args.input))
    else:
        from PIL import Image

        image = Image.open(args.input).convert("RGB")
        process_single_image(image, predict, preprocessor, args)


if __name__ == "__main__":
    main()
