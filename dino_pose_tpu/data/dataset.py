"""Pose dataset + host input pipeline with threaded prefetch.

Sample contract matches the reference ``PoseDataset.__getitem__``
(/root/reference/data_loader/data_loader.py:147-194): a dict with

- ``image``          (3, S, S) float32 preprocessed pixels
- ``2d_heatmaps``    (K, hs, hs) float32 Gaussian targets
- ``2d_keypoints``   (K, 3) float32 post-augmentation keypoints
- ``z_coords``       (K,) float32 normalised z

TPU-first split: augmentation geometry and the image warp run on the host
(PIL, vectorised numpy — reference-exact, see data/augment.py), while the
heatmap targets can be synthesised either on the host
(``render_targets=True``, reference-exact) or on device from the keypoints
inside the jitted train step (``render_targets=False`` — the loader then
omits ``2d_heatmaps`` and the trainer calls
:func:`dino_pose_tpu.data.heatmaps.render_heatmaps`, saving the
(B, K, 48, 48) host->device transfer every step).

The loader is a thread-pooled prefetcher rather than torch's fork-worker
DataLoader: decode/augment for the next batches overlaps device compute, and
batches are yielded as stacked numpy arrays ready for ``device_put``.
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Iterator

import numpy as np

from dino_pose_tpu.data import keypoints as kp_math
from dino_pose_tpu.data.augment import AugmentParams, augment_image_host, build_chain
from dino_pose_tpu.data.coco import CocoPoseAnnotations, image_path
from dino_pose_tpu.data.heatmaps import render_heatmaps_host
from dino_pose_tpu.data.preprocess import create_preprocessor


class PoseDataset:
    """COCO-format single-person pose dataset (reference contract)."""

    def __init__(
        self,
        images_dir_path,
        annotation_json_path,
        image_processor,
        num_model_keypoints: int,
        config_preproc: dict | None,
        config_model: dict,
        transform: bool = True,
        render_targets: bool = True,
        device_warp: bool = False,
        seed: int = 0,
    ):
        self.images_dir_path = images_dir_path
        self.image_processor = image_processor
        self.config_preproc = config_preproc
        self.config_model = config_model
        self.transform = transform
        self.render_targets = render_targets
        self.device_warp = device_warp
        self.seed = seed
        self.epoch = 0
        if device_warp:
            if not (
                transform
                and config_preproc
                and config_preproc.get("is_crop")
                and config_preproc.get("is_resize_shortest_edge")
            ):
                raise ValueError(
                    "device_warp requires the standard augmentation chain "
                    "(transform with is_resize_shortest_edge + is_crop)"
                )
            if render_targets:
                raise ValueError("device_warp implies render_targets=False")

        self.coco = CocoPoseAnnotations(annotation_json_path)
        self.num_keypoints = self.coco.num_keypoints
        if num_model_keypoints != self.num_keypoints:
            raise ValueError(
                f"Number of model keypoints ({num_model_keypoints}) does not "
                f"match number of keypoints in annotations ({self.num_keypoints})"
            )
        print(
            f"Loaded dataset with {len(self.coco)} images and "
            f"{self.num_keypoints} keypoints"
        )

    def __len__(self) -> int:
        return len(self.coco)

    def set_epoch(self, epoch: int) -> None:
        """Advance the augmentation RNG stream (new draws every epoch)."""
        self.epoch = epoch

    def load_image(self, idx: int):
        from PIL import Image

        rec = self.coco[idx]
        return Image.open(image_path(self.images_dir_path, rec)).convert("RGB")

    def __getitem__(self, idx: int) -> dict:
        rec = self.coco[idx]
        img = self.load_image(idx)
        kps = rec.keypoints.astype(np.float64).copy()
        z3d = rec.keypoints_z.astype(np.float64).copy()

        spec = None
        if self.transform and self.config_preproc:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch, idx])
            )
            params = AugmentParams.draw(rng, self.config_preproc)
            spec, kps, z3d = build_chain(
                kps,
                z3d,
                img.size,
                params,
                self.config_preproc,
                target_size=self.image_processor.crop_size["width"],
            )
            if self.device_warp:
                return self._device_warp_sample(img, spec, kps, z3d)
            img = augment_image_host(img, spec, self.config_preproc)
        else:
            kps = kps.astype(np.float32)
            z3d = z3d.astype(np.float32)

        z_coords = kp_math.normalize_z_np(kps, z3d)
        sample = {
            "image": self.image_processor(img)["pixel_values"][0],
            "2d_keypoints": kps.astype(np.float32),
            "z_coords": z_coords.astype(np.float32),
        }
        if self.render_targets:
            hs = int(self.config_model["output_heatmap_size"])
            sample["2d_heatmaps"] = render_heatmaps_host(kps, img.size, hs)
        return sample

    def _device_warp_sample(self, img, spec, kps, z3d) -> dict:
        """Fast path: one host letterbox; the warp runs on device in-step."""
        from dino_pose_tpu.data import warp as W

        canvas, canvas_scale = W.letterbox_canvas(img)
        wspec = W.chain_affine(
            spec,
            img.size,
            canvas_scale,
            model_input=self.image_processor.crop,
            shortest_edge=self.image_processor.shortest_edge,
        )
        z_coords = kp_math.normalize_z_np(kps, z3d)
        return {
            "canvas": canvas,
            "affine": wspec.affine,
            "pad_color": wspec.pad_color,
            "src_wh": np.array([wspec.src_w, wspec.src_h], np.float32),
            "occ": wspec.occ,
            "f3_affine": wspec.f3_affine,
            "f2_affine": wspec.f2_affine,
            "frame": wspec.frame,
            "2d_keypoints": kps.astype(np.float32),
            "z_coords": z_coords.astype(np.float32),
        }


def _collate(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class DataLoader:
    """Thread-pooled, shuffling, prefetching batch iterator.

    ``drop_last=True`` keeps batch shapes static (one XLA compilation);
    evaluation uses ``drop_last=False`` plus :func:`pad_batch`.
    """

    def __init__(
        self,
        dataset: PoseDataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 0,
        prefetch_batches: int = 2,
        shard_by_process: bool = False,
    ):
        """``shard_by_process=True`` gives each JAX process a disjoint
        (epoch-rotating) slice of the dataset — the per-host input sharding
        used for multi-host data-parallel training (every host feeds its own
        chips; the shuffle seed is shared so slices never overlap)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.shard_by_process = shard_by_process
        self._epoch = 0
        self._lock = threading.Lock()

    def _shard_info(self) -> tuple[int, int]:
        if not self.shard_by_process:
            return 0, 1
        import jax

        return jax.process_index(), jax.process_count()

    def set_epoch(self, epoch: int) -> None:
        """Fast-forward the per-epoch RNG streams (shuffle order + the
        dataset's augmentation draws) — auto-resume must continue the
        stream at ``start_epoch``, not replay epochs 0..N."""
        with self._lock:
            self._epoch = epoch

    def __len__(self) -> int:
        _, nshards = self._shard_info()
        n = -(-len(self.dataset) // nshards)  # ceil: shards are padded equal
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        with self._lock:
            epoch = self._epoch
            self._epoch += 1
        self.dataset.set_epoch(epoch)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            ).shuffle(order)
        rank, nshards = self._shard_info()
        if nshards > 1:
            # Equal-length shards keep every process's batch count identical
            # (multi-host steps are one global program — unequal counts
            # hang the collective). Pad with the epoch's leading indices
            # (≤ nshards-1 duplicates, torch DistributedSampler's policy)
            # instead of dropping the remainder, so every sample is seen.
            per = -(-len(order) // nshards)
            if per * nshards > len(order):
                order = np.concatenate([order, order[: per * nshards - len(order)]])
            order = order[rank * per : (rank + 1) * per]
        if self.drop_last:
            order = order[: len(order) - len(order) % self.batch_size]
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            window: list[list[cf.Future]] = []
            bi = 0
            # Keep prefetch_batches batches' worth of samples in flight.
            while bi < len(batches) or window:
                while bi < len(batches) and len(window) <= self.prefetch_batches:
                    window.append(
                        [pool.submit(self.dataset.__getitem__, int(i)) for i in batches[bi]]
                    )
                    bi += 1
                futures = window.pop(0)
                yield _collate([f.result() for f in futures])


def pad_batch(batch: dict, batch_size: int) -> tuple[dict, np.ndarray]:
    """Zero-pad a short batch to ``batch_size``; returns (batch, valid_mask)."""
    n = len(next(iter(batch.values())))
    valid = np.zeros(batch_size, bool)
    valid[:n] = True
    if n == batch_size:
        return batch, valid
    padded = {
        k: np.concatenate(
            [v, np.zeros((batch_size - n, *v.shape[1:]), v.dtype)]
        )
        for k, v in batch.items()
    }
    return padded, valid


def create_dataloaders(
    config_preproc: dict,
    config_model: dict,
    images_dir_path,
    annotation_json_path,
    batch_size: int = 8,
    num_workers: int = 4,
    *,
    shuffle: bool = True,
    transform: bool = True,
    drop_last: bool = True,
    render_targets: bool = True,
    device_warp: bool = False,
    seed: int = 0,
    shard_by_process: bool = False,
) -> DataLoader:
    """Reference factory shape (/root/reference/data_loader/data_loader.py:197-246).

    ``shard_by_process=True`` makes each JAX process load a disjoint slice of
    the dataset (multi-host data parallelism; see core/distributed.py).
    """
    from dino_pose_tpu.models.registry import resolve_model_name

    actual_model_name = resolve_model_name(config_model["model_name"])
    image_processor = create_preprocessor(actual_model_name)
    dataset = PoseDataset(
        images_dir_path=images_dir_path,
        annotation_json_path=annotation_json_path,
        image_processor=image_processor,
        num_model_keypoints=config_model["num_keypoints"],
        config_preproc=config_preproc,
        config_model=config_model,
        transform=transform,
        render_targets=render_targets and not device_warp,
        device_warp=device_warp,
        seed=seed,
    )
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        num_workers=num_workers,
        drop_last=drop_last,
        seed=seed,
        shard_by_process=shard_by_process,
    )
