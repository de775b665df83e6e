"""One-command real-dataset parity harness (round-3 verdict, next #6).

The reference's accuracy north star (BASELINE.json: "PCK@0.2 parity") needs
the custom 24-keypoint COCO dataset with ``keypoints_z``, which is not
mounted in this environment. This script makes closing it a single command
the day the dataset (and optionally a reference-trained checkpoint) exists:

    python scripts/real_dataset_parity.py \
        --train-images DIR --train-ann FILE \
        --val-images DIR --val-ann FILE \
        [--reference-checkpoint best_model.pth]  # torch .pth loads directly \
        [--eval-only] [--epochs N] [--model NAME]

It runs the full reference protocol — train (unless --eval-only) -> eval —
and writes ``parity_report.json`` + ``parity_report.md`` containing:

- PCKh@0.5 (2D), PCKh@0.5 (z), PCK@0.2-bbox over the val set, batched and
  jitted (/root/reference/src/model_utils.py:53-158 protocol);
- if a reference checkpoint is given: the same metrics for the *bridged*
  reference model evaluated by this framework, side by side — i.e. direct
  torch-vs-TPU accuracy parity on identical data.

Verified end-to-end here with ``--synthetic-dry-run`` (generates the
colored-blob synthetic dataset from scripts/accuracy_trajectory.py and runs
the whole train->eval->report path on it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor an explicit JAX_PLATFORMS env var over the environment's TPU-plugin
# sitecustomize, which rewrites jax_platforms to "axon,cpu" at import — a
# CPU-pinned dry run would otherwise hang initializing a dead TPU tunnel.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def evaluate_checkpoint(ckpt_path: str, val_images: str, val_ann: str,
                        batch_size: int = 32) -> dict:
    """Reference eval protocol on one checkpoint (.pth or .msgpack)."""
    from dino_pose_tpu.io import checkpoint as ck
    from dino_pose_tpu.train.evaluate import compute_pckh_dataset

    model = ck.load_model_smart(ckpt_path)
    metrics = compute_pckh_dataset(
        model, val_images, val_ann, batch_size=batch_size, return_all=True
    )
    return {k: float(v) for k, v in metrics.items()}


def run(args) -> dict:
    from dino_pose_tpu.config import get_default_configs

    report: dict = {"dataset": {"val_images": args.val_images, "val_ann": args.val_ann}}

    config_dataset, config_training, config_preproc, config_model = get_default_configs()
    config_model.update(model_name=args.model)

    trained_ckpt = None
    if not args.eval_only:
        from dino_pose_tpu.train.loop import fit

        config_dataset.update(
            train_images_dir=args.train_images,
            train_annotation_json=args.train_ann,
            val_images_dir=args.val_images,
            val_annotation_json=args.val_ann,
        )
        config_training.update(
            batch_size=args.batch_size,
            num_epochs=args.epochs,
            checkpoint_dir=args.out_dir,
            save_freq=max(1, min(args.epochs, config_training.get("save_freq", 10))),
            multiprocessing_num=args.num_workers,
            auto_resume=False,
        )
        if args.resume:
            config_model.update(load_model=args.resume)
        history = fit(
            config_dataset, config_training, config_preproc, config_model,
            progress=False,
        )
        report["train"] = {
            "epochs": args.epochs,
            "final_train_loss": history["train_loss"][-1] if history["train_loss"] else None,
            "final_val_loss": history["val_loss"][-1] if history["val_loss"] else None,
        }
        trained_ckpt = os.path.join(args.out_dir, "final_model.msgpack")

    if trained_ckpt:
        print(f"[parity] evaluating framework-trained checkpoint {trained_ckpt}")
        report["framework"] = evaluate_checkpoint(
            trained_ckpt, args.val_images, args.val_ann, args.batch_size
        )
    elif args.checkpoint:
        print(f"[parity] evaluating checkpoint {args.checkpoint}")
        report["framework"] = evaluate_checkpoint(
            args.checkpoint, args.val_images, args.val_ann, args.batch_size
        )

    if args.reference_checkpoint:
        # The bridged reference model under OUR eval protocol: direct
        # accuracy parity on identical data. load_model_smart imports the
        # torch .pth through io/torch_bridge (key/layout-lossless).
        print(f"[parity] evaluating reference checkpoint {args.reference_checkpoint}")
        report["reference"] = evaluate_checkpoint(
            args.reference_checkpoint, args.val_images, args.val_ann, args.batch_size
        )
        if "framework" in report:
            report["delta"] = {
                k: report["framework"][k] - report["reference"][k]
                for k in report["framework"]
                if k in report["reference"]
            }
    return report


def write_report(report: dict, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=1)

    rows = sorted(
        {k for side in ("framework", "reference") for k in report.get(side, {})}
    )
    lines = ["# Real-dataset parity report", ""]
    if "train" in report:
        t = report["train"]
        lines += [
            f"Trained {t['epochs']} epochs — final train loss "
            f"{t['final_train_loss']}, val loss {t['final_val_loss']}.", "",
        ]
    if rows:
        header = "| metric | framework |"
        sep = "|---|---|"
        if "reference" in report:
            header += " reference | delta |"
            sep += "---|---|"
        lines += [header, sep]
        for k in rows:
            row = f"| {k} | {report.get('framework', {}).get(k, '—')} |"
            if "reference" in report:
                row += (
                    f" {report.get('reference', {}).get(k, '—')} |"
                    f" {report.get('delta', {}).get(k, '—')} |"
                )
            lines.append(row)
    with open(os.path.join(out_dir, "parity_report.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[parity] report written to {out_dir}/parity_report.{{json,md}}")
    print(json.dumps({k: v for k, v in report.items() if k != "dataset"}, indent=1))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--train-images")
    ap.add_argument("--train-ann")
    ap.add_argument("--val-images")
    ap.add_argument("--val-ann")
    ap.add_argument("--model", default="facebook/dinov2-small")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--out-dir", default="/tmp/real_dataset_parity")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; evaluate --checkpoint / --reference-checkpoint")
    ap.add_argument("--checkpoint", help="framework checkpoint to evaluate (.msgpack/.pth)")
    ap.add_argument("--reference-checkpoint",
                    help="reference-trained torch .pth for side-by-side parity")
    ap.add_argument("--resume", help="checkpoint to fine-tune from")
    ap.add_argument("--synthetic-dry-run", action="store_true",
                    help="generate the synthetic dataset and drive the whole "
                         "harness on it (no real dataset needed)")
    args = ap.parse_args()

    if args.synthetic_dry_run:
        from scripts.accuracy_trajectory import make_dataset

        data_dir = os.path.join(args.out_dir, "data")
        if not os.path.exists(os.path.join(data_dir, "ann.json")):
            make_dataset(data_dir, n_images=32)
        args.train_images = args.val_images = os.path.join(data_dir, "images")
        args.train_ann = args.val_ann = os.path.join(data_dir, "ann.json")
        args.epochs = min(args.epochs, 2)
    if not (args.val_images and args.val_ann):
        ap.error("--val-images/--val-ann are required (or --synthetic-dry-run)")
    if not args.eval_only and not (args.train_images and args.train_ann):
        ap.error("--train-images/--train-ann are required unless --eval-only")

    report = run(args)
    write_report(report, args.out_dir)


if __name__ == "__main__":
    main()
