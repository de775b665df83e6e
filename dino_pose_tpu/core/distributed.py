"""Multi-host (multi-process) runtime support.

The reference is strictly single-device (/root/reference/train.py:236-242);
multi-host data parallelism is a capability this framework adds per
SURVEY §2.3. The TPU-native design needs no hand-written communication
backend: each host runs the same program, ``jax.distributed.initialize``
wires the processes into one runtime, every host's input pipeline loads a
disjoint shard (``DataLoader(shard_by_process=True)``), per-host batches are
assembled into one global array with
``jax.make_array_from_process_local_data``, and XLA inserts the gradient
all-reduce across ICI/DCN from the shardings alone.

Launch contract (one process per host):

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 \
    JAX_PROCESS_ID=<0..3> python train.py ...

On SLURM (detected via ``SLURM_NTASKS`` > 1), ``jax.distributed.initialize()``
is called with no arguments and JAX's own cluster auto-detection fills in the
coordinator/process topology. Other managed launchers must export the env
contract above — no further auto-detection is attempted, because a wrong
guess silently trains N independent models that all believe they are the
primary writer.
"""

from __future__ import annotations

import os

import jax


def maybe_initialize_distributed() -> bool:
    """Initialise ``jax.distributed`` when a multi-process launch is configured.

    Must run before the first use of any JAX backend. Safe to call in
    single-process runs (no-op) and after initialisation (no-op).
    Returns True when this run is multi-process.
    """
    if jax._src.distributed.global_state.client is not None:  # already up
        return jax.process_count() > 1

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    slurm_ntasks = os.environ.get("SLURM_NTASKS") or os.environ.get("SLURM_NPROCS")
    if addr and nproc and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    elif slurm_ntasks and int(slurm_ntasks) > 1:
        # SLURM multi-task launch: JAX's cluster auto-detection resolves
        # the coordinator and process ids from the SLURM environment.
        jax.distributed.initialize()
    else:
        return False
    # Establish the cross-process collective context NOW, while every
    # process is at the same point. The context is otherwise created at
    # the first sharded execution — after each process's big jit
    # compiles, whose durations can skew arbitrarily (e.g. one process
    # hits the persistent compilation cache the other just populated)
    # and blow the backend's fixed context-init handshake timeout.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dino_pose_tpu:distributed_init")
    return True


def is_primary() -> bool:
    """True on the process that owns checkpoint/metrics writes."""
    return jax.process_index() == 0


def broadcast_string(s: str | None, max_len: int = 4096) -> str | None:
    """Broadcast a string (e.g. a resolved checkpoint path) from process 0.

    Only the primary writes checkpoints, so on a non-shared filesystem each
    process resolving ``latest_checkpoint`` independently can disagree —
    the primary's resolution is authoritative.
    """
    import numpy as np
    from jax.experimental import multihost_utils

    data = (s or "").encode()[:max_len]
    buf = np.zeros(max_len, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    decoded = bytes(out).rstrip(b"\x00").decode()
    return decoded or None


def broadcast_pytree(tree):
    """Replicate a pytree of arrays from process 0 to every process.

    Used after checkpoint resume: replicated parameters/optimizer state must
    be bit-identical across processes or training silently diverges (the
    per-process values would disagree with no error raised).
    """
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def make_global_batch(batch: dict, sharding) -> dict:
    """Assemble per-host numpy batches into one global sharded batch.

    Every process passes its own local shard (the loader's
    ``shard_by_process`` slice); the result is a global jax.Array whose
    leading axis is the concatenation over processes, laid out according to
    ``sharding`` (batch over the mesh 'data' axis).
    """
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
