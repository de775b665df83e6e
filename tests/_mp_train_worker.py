"""Subprocess worker for the multi-process training parity test.

Runs ``fit`` on a synthetic dataset and dumps the loss history as JSON.
Multi-process mode is configured purely through the launch-contract env vars
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) consumed by
``dino_pose_tpu.core.distributed.maybe_initialize_distributed`` — this script
only prepares the virtual-CPU backend, mirroring what a real multi-host TPU
launch gets from its runtime.

Usage: python _mp_train_worker.py <dataset_dir> <ckpt_dir> <out_json> <local_bs*nproc>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_compilation_cache_dir", "/tmp/dino_pose_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
if int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1:
    # CPU cross-process collectives need an explicit implementation.
    jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    dataset_dir, ckpt_dir, out_json, global_bs = sys.argv[1:5]

    from dino_pose_tpu.config import get_default_configs
    from dino_pose_tpu.train.loop import fit

    if os.environ.get("MP_TEST_PRETEND_NO_CKPT"):
        # Simulate a non-shared filesystem for the auto-resume broadcast
        # test: this process must act as if the primary's checkpoint file
        # does not exist locally (the real scenario on separate hosts —
        # unreproducible on one machine where tmp dirs are shared).
        real_isfile = os.path.isfile
        os.path.isfile = lambda p: (
            False if str(p).endswith(".msgpack") else real_isfile(p)
        )

    config_dataset, config_training, config_preproc, config_model = get_default_configs()
    config_dataset.update(
        train_images_dir=os.path.join(dataset_dir, "images"),
        train_annotation_json=os.path.join(dataset_dir, "ann.json"),
        val_images_dir=os.path.join(dataset_dir, "images"),
        val_annotation_json=os.path.join(dataset_dir, "ann.json"),
    )
    config_training.update(
        batch_size=int(global_bs),
        num_epochs=2,
        save_freq=100,  # skip PCKh-gated saves (compile cost)
        checkpoint_dir=ckpt_dir,
        multiprocessing_num=2,
        learning_rate=1e-3,
    )
    config_model.update(
        model_name="test/vit-tiny",
        use_lora=True,
        lora_dropout=0.0,  # keep the step deterministic for loss parity
        unfreeze_last_n_layers=0,
    )

    history = fit(
        config_dataset, config_training, config_preproc, config_model,
        progress=False, export_pth=False,
    )
    # Fingerprint of the final replicated parameters: across processes these
    # must be (bit-)identical or replication has silently diverged.
    param_sum = float(
        sum(jax.device_get(x).astype("float64").sum()
            for x in jax.tree_util.tree_leaves(history["state"].params))
    )
    from dino_pose_tpu.train import evaluate

    with open(out_json, "w") as f:
        json.dump(
            {"train_loss": history["train_loss"], "val_loss": history["val_loss"],
             "process_count": jax.process_count(), "param_sum": param_sum,
             "pckh_2d": history["best_pckh_2d"],
             "eval_local_images": evaluate.last_eval_info.get("local_images"),
             "eval_total_images": evaluate.last_eval_info.get("total_images")},
            f,
        )


if __name__ == "__main__":
    main()
