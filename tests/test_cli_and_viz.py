"""CLI + visualisation smoke/behaviour tests (tiny model, Agg backend)."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest
from PIL import Image

from dino_pose_tpu.io import checkpoint as ck
from dino_pose_tpu.models import registry

CONFIG = {
    "model_name": "test/vit-tiny",
    "num_keypoints": 24,
    "output_heatmap_size": 48,
    "use_lora": True,
}


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    model = registry.create_model_from_config(CONFIG, pretrained=False)
    d = tmp_path_factory.mktemp("cli")
    path = d / "model.msgpack"
    ck.save_checkpoint(path, model, epoch=5, train_loss=0.3, valid_loss=0.4)
    return str(path)


@pytest.fixture(scope="module")
def image_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("img")
    p = d / "person.jpg"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (300, 400, 3), dtype=np.uint8)).save(p)
    return str(p)


def test_viz_plots():
    from dino_pose_tpu import viz

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
    hm = rng.random((24, 48, 48)).astype(np.float32)
    z = rng.standard_normal(24).astype(np.float32)
    kps3 = np.concatenate(
        [rng.uniform(0, 224, (24, 2)), np.ones((24, 1))], axis=1
    ).astype(np.float32)

    for fig in (
        viz.plot_keypoints(img, hm, keypoint_label=False),
        viz.plot_3d_keypoints(img, hm, z, keypoint_label=False),
        viz.plot_keypoints_combined(img, hm, z),
        viz.visualize_pose(img, kps3),
    ):
        arr = viz.fig_to_array(fig)
        assert arr.ndim == 3 and arr.shape[-1] == 3
        import matplotlib.pyplot as plt

        plt.close(fig)


def test_demo_image(ckpt, image_file, tmp_path):
    from dino_pose_tpu.cli.demo import main

    out = tmp_path / "out.png"
    main(["--input", image_file, "--model", ckpt, "--output", str(out),
          "--plot_mode", "2d", "--show_info"])
    assert out.exists() and out.stat().st_size > 0


def test_demo_gif(ckpt, tmp_path):
    import imageio

    from dino_pose_tpu.cli.demo import main

    rng = np.random.default_rng(1)
    gif_in = tmp_path / "in.gif"
    frames = [rng.integers(0, 256, (120, 160, 3), dtype=np.uint8) for _ in range(3)]
    imageio.mimsave(gif_in, frames, fps=5)
    gif_out = tmp_path / "out.gif"
    main(["--input", str(gif_in), "--model", ckpt, "--output", str(gif_out),
          "--max_frames", "2", "--batch_size", "2"])
    assert gif_out.exists()
    assert len(imageio.mimread(gif_out)) == 2


def test_model_info_cli(ckpt, capsys, tmp_path):
    from dino_pose_tpu.cli.model_info import main

    main(["--backbones"])
    out = capsys.readouterr().out
    assert "facebook/dinov2-small" in out and "fastvit" in out

    main(["--families"])
    out = capsys.readouterr().out
    assert "DINOV2 Family" in out

    main(["--checkpoint", ckpt])
    out = capsys.readouterr().out
    assert "Dinov2PoseModelLoRA" in out and "epoch: 5" in out

    main(["--list-checkpoints", os.path.dirname(ckpt)])
    out = capsys.readouterr().out
    assert "model.msgpack" in out


def test_export_coreml_pth(ckpt, tmp_path, capsys):
    from dino_pose_tpu.cli.export_coreml import detect_model_family, main

    out = tmp_path / "export.pth"
    main(["-c", ckpt, "-o", str(out)])
    assert out.exists()
    captured = capsys.readouterr().out
    assert "Self-check forward: heatmaps (1, 24, 48, 48), depths (1, 24)" in captured

    raw = ck.load_checkpoint(str(out))
    family, cfg = detect_model_family(raw["model_state_dict"])
    assert family == "dinov2_lora"
    assert cfg["lora_rank"] == 8

    # .mlpackage request degrades gracefully to .pth (coremltools absent).
    ml = tmp_path / "m.mlpackage"
    main(["-c", ckpt, "-o", str(ml)])
    assert (tmp_path / "m.pth").exists()


def test_benchmark_cli(ckpt, capsys):
    from dino_pose_tpu.cli.benchmark_model import benchmark_model

    result = benchmark_model(ckpt, warmup=1, iters=2)
    assert result["avg_ms"] > 0 and result["device_ms"] > 0
    assert result["params"] > 0


def test_bench_emits_structured_error_on_dead_backend(monkeypatch, capsys):
    """A dead TPU tunnel must produce ONE parseable JSON line (rc 0), not a
    raw traceback — the round-3 outage left BENCH_r03.json with parsed: null."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    def boom(args):
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
            "setup/compile error (Unavailable)."
        )

    monkeypatch.setattr(bench, "_run_mode", boom)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--mode", "train"])
    monkeypatch.setattr(
        "dino_pose_tpu.utils.cache.enable_persistent_cache", lambda: None
    )
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["error"] == "tpu_unavailable"
    assert parsed["metric"] == "finetune_images_per_sec_per_chip"
    assert parsed["value"] is None


def test_bench_watchdog_emits_error_on_init_hang(monkeypatch, capsys):
    """A backend init that HANGS (the observed dead-tunnel mode: 25-min
    probes that never return) must still produce the structured JSON error
    line instead of an empty driver timeout."""
    import json
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setenv("DINO_POSE_TPU_INIT_TIMEOUT", "0.2")
    calls = {}
    monkeypatch.setattr("os._exit", lambda code: calls.setdefault("code", code))
    monkeypatch.setattr(bench.jax, "devices", lambda *a, **k: time.sleep(1.5))

    bench._init_backend_or_die("train")

    assert calls["code"] == 0  # watchdog fired (os._exit intercepted)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["error"] == "tpu_unavailable"
    assert "init exceeded" in parsed["detail"]
