"""Checkpoint save/load: native msgpack + PyTorch ``.pth`` interchange.

Mirrors the reference checkpoint subsystem
(/root/reference/model/model_utils.py:227-433): the same metadata schema
(epoch, losses, ``loss_weight``, all three configs, ``model_architecture``,
``model_type``), a ``load_model_smart`` that reconstructs the architecture
from the checkpoint alone, and ``get_model_info`` for metadata-only reads.

Two on-disk formats:

- **native** (``*.msgpack``): the full JAX training state — parameters,
  batch stats, optimizer state, loss-weighting EMA state, plateau-scheduler
  state — via flax msgpack serialisation. This is the fast path used by the
  trainer for save/auto-resume.
- **torch** (``*.pth``): the reference's exact state-dict schema rendered
  through :mod:`dino_pose_tpu.io.torch_bridge`, so checkpoints remain
  weight-compatible with the PyTorch project: its ``load_model_smart``,
  key-based family detection and CoreML exporter
  (/root/reference/export_coreml.py:16-165) consume them unchanged.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization

from dino_pose_tpu.models.pose import PoseModel
from dino_pose_tpu.io import torch_bridge as tb
from dino_pose_tpu.train.schedule import PlateauState

NATIVE_FORMAT = "dino_pose_tpu/checkpoint/v1"

# Reference class names, used in checkpoint metadata so 'LoRA' in class_name
# detection (model_utils.py:246,316,339) keeps working.
_REFERENCE_CLASS_NAMES = {
    ("dinov2", False): "Dinov2PoseModel",
    ("dinov2", True): "Dinov2PoseModelLoRA",
    ("fastvit", False): "FastVitPoseModel",
    ("fastvit", True): "FastVitPoseModelLoRA",
}


def reference_class_name(model: PoseModel) -> str:
    return _REFERENCE_CLASS_NAMES[(model.family, model.use_lora)]


def rules_for_model(model: PoseModel) -> list[tb.Rule]:
    """Bridge rules covering the model's full variable tree.

    The heads' upsampling-stage count follows the model's actual geometry
    (``upsampling_plan``) — hardcoding the default-config 2 desyncs the
    rules from the built tree for any non-48 ``output_heatmap_size``:
    restore would silently leave extra up stages random-initialised."""
    from dino_pose_tpu.models.heads import upsampling_plan

    if model.family == "dinov2":
        vit_cfg = model.module.vit
        spatial = model.input_size // vit_cfg.patch_size
        n_up = len(upsampling_plan(spatial, model.heatmap_size))
        return tb.dinov2_pose_rules(
            vit_cfg.num_layers, vit_cfg.lora_layers, num_up_stages=n_up
        )
    if model.family == "fastvit":
        from dino_pose_tpu.models.fastvit_pose import (
            _REFERENCE_SPATIAL_INPUT_SIZE,
        )

        n_up = len(
            upsampling_plan(_REFERENCE_SPATIAL_INPUT_SIZE, model.heatmap_size)
        )
        return tb.fastvit_pose_rules(model.module.cfg, num_up_stages=n_up)
    raise NotImplementedError(f"No torch bridge rules for family {model.family}")


def _enhanced_config_model(model: PoseModel, config_model: dict) -> dict:
    cfg = dict(config_model)
    cfg["model_class"] = reference_class_name(model)
    cfg["model_type"] = "lora" if model.use_lora else "standard"
    cfg["model_family"] = model.family
    return cfg


def _architecture(model: PoseModel) -> dict:
    return {
        "class_name": reference_class_name(model),
        "num_keypoints": model.num_keypoints,
        "backbone": model.model_name,
        "heatmap_size": model.heatmap_size,
    }


def _host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def snapshot_to_host(tree):
    """One donation-safe host snapshot of a device tree.

    Schedules every D2H copy first, then materialises — callers saving the
    SAME state to several formats (msgpack + .pth) should snapshot once and
    pass the numpy tree to each ``save_checkpoint``, whose internal
    snapshot then degenerates to a free identity walk over numpy leaves.
    """
    _schedule_host_copies(tree)
    return _host(tree)


class AsyncCheckpointWriter:
    """Non-blocking checkpoint saves for the training loop.

    Design (why not orbax's AsyncCheckpointer): the on-disk formats here ARE
    the compatibility contract — flax msgpack + the reference's ``.pth``
    state-dict schema — and orbax writes its own directory layout, which the
    PyTorch/CoreML toolchain could not consume. Instead the split is:

    - device→host copies are scheduled AND materialised to numpy on the
      caller's thread before ``save_checkpoint`` returns — a donated train
      step dispatched afterwards deletes the source jax.Arrays at the
      Python level, so no device array may cross into the worker;
    - serialization and disk IO (the actually-slow part for ≥300M-param
      backbones) run on one worker thread, preserving save order.

    ``wait()`` drains pending writes and re-raises the first failure; the
    trainer calls it before finishing (and before anything re-reads
    ``latest_checkpoint``).
    """

    def __init__(self):
        import concurrent.futures as cf

        self._pool = cf.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer"
        )
        self._pending: list = []

    def submit(self, fn, *args, **kwargs) -> None:
        # Fail fast: surface an already-failed earlier write NOW rather
        # than letting a long run burn hardware time saving nothing and
        # only hearing about it (or not at all) at the final wait().
        done = [f for f in self._pending if f.done()]
        self._pending = [f for f in self._pending if not f.done()]
        for f in done:
            f.result()  # raises the first write error on the caller thread
        self._pending.append(self._pool.submit(fn, *args, **kwargs))

    def wait(self) -> None:
        pending, self._pending = self._pending, []
        errors = []
        for f in pending:
            try:
                f.result()
            except Exception as e:  # noqa: BLE001 — gather, then re-raise
                errors.append(e)
        if errors:
            if len(errors) == 1:
                raise errors[0]
            raise RuntimeError(
                f"{len(errors)} checkpoint writes failed; first: {errors[0]!r}"
            ) from errors[0]


def _schedule_host_copies(tree) -> None:
    """Start async D2H transfers for every jax.Array in the tree."""

    def start(x):
        if isinstance(x, jax.Array):
            try:
                x.copy_to_host_async()
            except Exception:  # noqa: BLE001 — committed-elsewhere etc.
                pass
        return x

    jax.tree.map(start, tree)


# ---------------------------------------------------------------------------
# Save
# ---------------------------------------------------------------------------

def save_checkpoint(
    save_path: str | os.PathLike,
    model: PoseModel,
    *,
    state=None,
    epoch: int = 0,
    train_loss: float = 0.0,
    valid_loss: float = 0.0,
    config_training: dict | None = None,
    config_preproc: dict | None = None,
    scheduler: PlateauState | None = None,
    loss_weight: float | None = None,
    async_writer: AsyncCheckpointWriter | None = None,
) -> None:
    """Save in the format selected by the file suffix (.pth or .msgpack).

    With ``async_writer``, device→host copies start immediately but
    serialization + disk IO run on the writer's thread; call
    ``async_writer.wait()`` before relying on the file.

    ``state`` is an optional :class:`~dino_pose_tpu.train.state.TrainState`;
    when given, its parameters/batch-stats are saved (they are the live
    training values) together with optimizer + loss-weight state (native
    format only). Without it the model's own variables are saved.

    ``loss_weight`` overrides the scalar written to the checkpoint's
    ``loss_weight`` field (used when re-exporting an existing checkpoint,
    whose recorded weight must be preserved). When a ``state`` is given the
    field records ``state.loss_weight.best_weight`` — the best-validation
    weight, matching the reference, which saves ``loss_weighting.best_weight``
    (/root/reference/train.py:361-371, model/model_utils.py:227-283).
    """
    save_path = os.fspath(save_path)
    save_fn = _save_pth if save_path.endswith(".pth") else _save_native

    if async_writer is not None:
        # Snapshot to host ON THE CALLER THREAD before returning: once the
        # trainer's next donated step dispatches, the state's ArrayImpls are
        # marked deleted and any later device_get on them raises "Array has
        # been deleted" (copy_to_host_async starts the transfer but does NOT
        # cache the value on the jax.Array). Scheduling all copies first
        # makes the subsequent materialisation a cheap drain of in-flight
        # transfers; only numpy trees reach the worker thread, which keeps
        # just the serialization + disk IO off the training loop.
        tree = snapshot_to_host(model.variables if state is None else state)
        if state is not None:
            state = tree
            variables = {"params": state.params, "batch_stats": state.batch_stats}
        else:
            variables = tree
    elif state is not None:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        variables = model.variables

    args = (
        save_path, model, variables, state, epoch, train_loss, valid_loss,
        config_training or {}, config_preproc or {}, scheduler, loss_weight,
    )
    if async_writer is not None:
        async_writer.submit(save_fn, *args)
    else:
        save_fn(*args)
    print(f"Saved checkpoint to {save_path}")


def _save_native(
    path, model, variables, state, epoch, train_loss, valid_loss,
    config_training, config_preproc, scheduler, loss_weight=None,
) -> None:
    payload: dict[str, Any] = {
        "format": NATIVE_FORMAT,
        "epoch": int(epoch),
        "train_loss": float(train_loss),
        "valid_loss": float(valid_loss),
        "variables": serialization.to_state_dict(_host(variables)),
        "config_model": _enhanced_config_model(model, model.config_model),
        "config_training": dict(config_training),
        "config_preproc": dict(config_preproc),
        "model_architecture": _architecture(model),
    }
    if state is not None:
        payload["step"] = int(jax.device_get(state.step))
        payload["opt_state"] = serialization.to_state_dict(_host(state.opt_state))
        payload["loss_weight_state"] = serialization.to_state_dict(
            _host(state.loss_weight)
        )
        payload["loss_weight"] = float(
            jax.device_get(state.loss_weight.best_weight)
        )
    if loss_weight is not None:
        payload["loss_weight"] = float(loss_weight)
    if scheduler is not None:
        payload["scheduler_state_dict"] = scheduler.state_dict()
    data = serialization.msgpack_serialize(payload)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _save_pth(
    path, model, variables, state, epoch, train_loss, valid_loss,
    config_training, config_preproc, scheduler, loss_weight=None,
) -> None:
    import torch

    rules = rules_for_model(model)
    state_dict = {
        k: torch.tensor(v)
        for k, v in tb.export_params(_host(variables), rules).items()
    }
    for k in tb.num_batches_tracked_keys(rules):
        state_dict[k] = torch.tensor(0, dtype=torch.int64)

    if loss_weight is None:
        loss_weight = 0.1
        if state is not None:
            loss_weight = float(jax.device_get(state.loss_weight.best_weight))
    checkpoint = {
        "epoch": int(epoch),
        "model_state_dict": state_dict,
        # The torch optimizer state is framework-specific; the reference's
        # consumers of .pth files (smart loader, CoreML exporter) never read
        # it, so export an empty one.
        "optimizer_state_dict": {},
        "train_loss": float(train_loss),
        "valid_loss": float(valid_loss),
        "loss_weight": loss_weight,
        "config_model": _enhanced_config_model(model, model.config_model),
        "config_training": dict(config_training),
        "config_preproc": dict(config_preproc),
        "model_architecture": _architecture(model),
    }
    if scheduler is not None:
        checkpoint["scheduler_state_dict"] = scheduler.state_dict()
    # Atomic like _save_native: a kill mid-torch.save must not leave a
    # truncated .pth where the PyTorch/CoreML toolchain expects a good one.
    tmp = f"{path}.tmp"
    torch.save(checkpoint, tmp)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Load
# ---------------------------------------------------------------------------

def load_checkpoint(path: str | os.PathLike) -> dict:
    """Read a checkpoint file (either format) into a plain dict."""
    path = os.fspath(path)
    if path.endswith(".pth"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if "model_state_dict" in ckpt:
            ckpt["model_state_dict"] = {
                k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
                for k, v in ckpt["model_state_dict"].items()
            }
        return ckpt
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if payload.get("format") != NATIVE_FORMAT:
        raise ValueError(f"Not a {NATIVE_FORMAT} checkpoint: {path}")
    return payload


def _model_from_ckpt_config(ckpt: dict) -> dict:
    if "config_model" in ckpt:
        return dict(ckpt["config_model"])
    if "model_architecture" in ckpt:
        arch = ckpt["model_architecture"]
        return {
            "model_name": arch["backbone"],
            "num_keypoints": arch["num_keypoints"],
            "output_heatmap_size": arch["heatmap_size"],
            "use_lora": "LoRA" in arch["class_name"],
        }
    raise ValueError("Checkpoint missing model configuration")


def load_model_smart(
    model_path: str, eval_mode: bool = True, *, ckpt: dict | None = None
) -> PoseModel:
    """Build a model from a checkpoint file, registry name or family name.

    Mirrors /root/reference/model/model_utils.py:285-393: ``.pth``/``.msgpack``
    files rebuild the architecture from the embedded config and load weights
    non-strictly; registry/family names create fresh (pretrained-backbone)
    models. ``ckpt`` lets a caller that already deserialized the file skip
    the second (potentially multi-GB) load.
    """
    from dino_pose_tpu.models import registry

    if os.path.isfile(model_path) and model_path.endswith((".pth", ".msgpack")):
        print(f"Loading model from checkpoint: {model_path}")
        ckpt = ckpt if ckpt is not None else load_checkpoint(model_path)
        config_model = _model_from_ckpt_config(ckpt)
        model = registry.create_model_from_config(config_model, pretrained=False)

        if model_path.endswith(".pth"):
            rules = rules_for_model(model)
            torch_state = ckpt["model_state_dict"]
            have = {r.torch_key for r in rules}
            unexpected = [
                k for k in torch_state
                if k not in have and not k.endswith("num_batches_tracked")
            ]
            missing = [r.torch_key for r in rules if r.torch_key not in torch_state]
            if missing:
                print(f"Warning: Missing keys in checkpoint: {missing}")
            if unexpected:
                print(f"Warning: Unexpected keys in checkpoint: {unexpected}")
            model.variables = tb.import_params(
                model.variables, torch_state, rules, strict=False
            )
        else:
            model.variables = serialization.from_state_dict(
                model.variables, ckpt["variables"]
            )
        print(f"Loaded weights from epoch {ckpt.get('epoch', 'unknown')}")
        # The reference's apply_loading_fixes re-syncs LoRA rank/alpha/dropout
        # modes after load (dinov2_pose.py:325-348); here those are static
        # attributes of the module config, so nothing can drift.
        return model

    if registry.is_supported_backbone(model_path) or registry.is_family_name(model_path):
        actual = registry.resolve_model_name(model_path)
        if registry.is_family_name(model_path):
            print(f"Using family '{model_path}' -> default model: {actual}")
        else:
            print(f"Creating new model with registered backbone: {actual}")
        entry = registry.BACKBONE_REGISTRY[actual]
        config_model = dict(entry.default_config)
        config_model["model_name"] = actual
        return registry.create_model_from_config(config_model)

    raise ValueError(
        f"Invalid model path: {model_path}. Expected .pth/.msgpack file, family "
        f"name {list(registry.FAMILY_DEFAULTS)}, or supported backbone model "
        "name. Use 'model_info.py --backbones' to see all options."
    )


def restore_train_state(ckpt: dict, state, scheduler: PlateauState):
    """Resume optimizer/scheduler/loss-weight from a native checkpoint.

    ``state`` is a freshly-created TrainState template (for tree structure);
    returns (state, scheduler, start_epoch) like the reference resume path
    (/root/reference/train.py:285-304).
    """
    new_state = state
    if "opt_state" in ckpt:
        new_state = new_state.replace(
            opt_state=serialization.from_state_dict(state.opt_state, ckpt["opt_state"])
        )
    if "loss_weight_state" in ckpt:
        new_state = new_state.replace(
            loss_weight=serialization.from_state_dict(
                state.loss_weight, ckpt["loss_weight_state"]
            )
        )
    if "step" in ckpt:
        new_state = new_state.replace(
            step=jax.numpy.asarray(int(ckpt["step"]), jax.numpy.int32)
        )
    if "scheduler_state_dict" in ckpt:
        scheduler = PlateauState.from_state_dict(
            {**scheduler.state_dict(), **ckpt["scheduler_state_dict"]}
        )
    return new_state, scheduler, int(ckpt.get("epoch", 0))


def get_model_info(model_path: str) -> dict:
    """Checkpoint metadata without building the model (model_utils.py:395-429)."""
    path = os.fspath(model_path)
    if not os.path.isfile(path) or not path.endswith((".pth", ".msgpack")):
        raise ValueError(f"Invalid checkpoint path: {model_path}")
    ckpt = load_checkpoint(path)
    info = {
        "epoch": ckpt.get("epoch", "unknown"),
        "train_loss": ckpt.get("train_loss", "unknown"),
        "valid_loss": ckpt.get("valid_loss", "unknown"),
        "loss_weight": ckpt.get("loss_weight", "unknown"),
    }
    if "config_model" in ckpt:
        config = ckpt["config_model"]
        info.update(
            {
                "model_type": config.get("model_type", "unknown"),
                "backbone": config.get("model_name", "unknown"),
                "family": config.get("model_family", "unknown"),
                "num_keypoints": config.get("num_keypoints", "unknown"),
                "use_lora": config.get("use_lora", False),
                "heatmap_size": config.get("output_heatmap_size", "unknown"),
            }
        )
    if "model_architecture" in ckpt:
        arch = ckpt["model_architecture"]
        info.update({"class_name": arch.get("class_name", "unknown"), "architecture": arch})
    return info


def latest_checkpoint(checkpoint_dir: str | os.PathLike) -> str | None:
    """Most recent native checkpoint in a directory (auto-resume support)."""
    try:
        files = [
            os.path.join(checkpoint_dir, f)
            for f in os.listdir(checkpoint_dir)
            if f.endswith(".msgpack")
        ]
    except FileNotFoundError:
        return None
    return max(files, key=os.path.getmtime) if files else None
