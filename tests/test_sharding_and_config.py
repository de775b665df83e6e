"""Per-host input sharding + reference-style config file loading."""

import json

import numpy as np
import pytest
from PIL import Image

from dino_pose_tpu.config import get_default_configs, load_config_file
from dino_pose_tpu.data.dataset import create_dataloaders

K = 24


@pytest.fixture(scope="module")
def coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("shard")
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(8):
        Image.fromarray(rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)).save(
            root / "images" / f"{i}.png"
        )
        kps = np.stack(
            [rng.uniform(20, 180, K), rng.uniform(20, 180, K), np.full(K, 2.0)], 1
        )
        images.append({"id": i, "file_name": f"{i}.png", "width": 200, "height": 200})
        annotations.append(
            {"id": i, "image_id": i, "num_keypoints": K,
             "keypoints": kps.reshape(-1).tolist(),
             # unique z per image -> identifies which records a shard saw
             "keypoints_z": (np.full(K, float(i)) + rng.uniform(0, 0.4, K)).tolist()}
        )
    (root / "ann.json").write_text(json.dumps({"images": images, "annotations": annotations}))
    return root


def test_process_shards_are_disjoint_and_cover(coco):
    _, _, config_preproc, config_model = get_default_configs()

    def loader_for(rank, nshards):
        loader = create_dataloaders(
            config_preproc, config_model, coco / "images", coco / "ann.json",
            batch_size=2, num_workers=1, transform=False, shuffle=True, seed=7,
        )
        loader.shard_by_process = True
        loader._shard_info = lambda: (rank, nshards)
        return loader

    seen = []
    for rank in range(2):
        loader = loader_for(rank, 2)
        assert len(loader) == 2  # 8 records / 2 shards / bs 2
        ids = set()
        for batch in loader:
            # transform=False keeps raw annotation keypoints: the first x
            # coordinate uniquely identifies each record.
            ids.update(np.round(batch["2d_keypoints"][:, 0, 0], 3).tolist())
        seen.append(ids)
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 8


def test_load_reference_style_config_file(tmp_path):
    """A config file in the reference's plain-4-dicts form loads unchanged."""
    cfg = tmp_path / "my_config.py"
    cfg.write_text(
        '''
def get_default_configs():
    config_dataset = {
        "train_images_dir": "/data/train/images",
        "train_annotation_json": "/data/train/ann.json",
        "val_images_dir": "",
        "val_annotation_json": "",
    }
    config_training = {
        "batch_size": 16, "learning_rate": 1e-4, "weight_decay": 1e-6,
        "num_epochs": 3, "multiprocessing_num": 2, "save_freq": 1,
        "checkpoint_dir": "ckpts",
    }
    config_preproc = {"pre_crop": False, "is_scale": False, "is_rotate": False,
                      "is_flipping": False, "is_resize_shortest_edge": True,
                      "is_crop": True, "is_occultation": False,
                      "random_resize_min": 0.7, "random_resize_max": 1.3,
                      "rotate_min_degree": -45, "rotate_max_degree": 45,
                      "heatmap_std": 0.5}
    config_model = {"model_name": "dinov2", "load_model": "",
                    "num_keypoints": 24, "unfreeze_last_n_layers": 0,
                    "use_lora": True, "lora_rank": 4, "lora_alpha": 8,
                    "lora_dropout": 0.0, "output_heatmap_size": 48}
    return config_dataset, config_training, config_preproc, config_model
'''
    )
    cd, ct, cp, cm = load_config_file(str(cfg))
    assert ct["batch_size"] == 16
    assert cm["model_name"] == "dinov2" and cm["lora_rank"] == 4
    assert cp["is_crop"] is True
    assert cd["train_images_dir"] == "/data/train/images"


def test_lr_schedule_overrides():
    """Optional config_training lr_factor/lr_patience/min_lr knobs; defaults
    match the reference's hard-coded ReduceLROnPlateau (train.py:289-295)."""
    from dino_pose_tpu.train.schedule import PlateauState, plateau_step

    # min_lr == lr pins the rate no matter how many bad epochs accrue.
    s = PlateauState(lr=1e-3, min_lr=1e-3)
    for _ in range(10):
        s = plateau_step(s, 5.0)
    assert s.lr == 1e-3

    # Reference defaults: decay by 0.7 after patience 3 is exceeded.
    s = PlateauState(lr=1e-3)
    for _ in range(5):
        s = plateau_step(s, 5.0)
    assert s.lr < 1e-3


def test_hourglass_rejects_non_divisible_grid():
    """Grids not divisible by 4 (23x23 at 322 input, but also even 22x22:
    22 -> 11 -> 6 -> 12 -> 24) fail loudly with the documented constraint
    instead of a broadcast shape error."""
    import jax
    import jax.numpy as jnp
    import pytest

    from dino_pose_tpu.models.heads import HourglassModule

    m = HourglassModule(out_channels=32)
    for grid in (23, 22):
        with pytest.raises(ValueError, match="divisible by 4"):
            m.init(jax.random.key(0), jnp.zeros((1, grid, grid, 16)), train=False)


def test_non_divisible_shards_cover_all_and_stay_equal(coco):
    """8 records over 3 shards: ceil-padding with the epoch's leading
    indices (1 duplicate) keeps per-shard lengths — hence multi-host batch
    counts — equal, and drops nothing (the old len//nshards slicing lost
    up to nshards-1 samples every epoch)."""
    _, _, config_preproc, config_model = get_default_configs()

    def loader_for(rank, nshards):
        loader = create_dataloaders(
            config_preproc, config_model, coco / "images", coco / "ann.json",
            batch_size=2, num_workers=1, transform=False, shuffle=True,
            seed=7, drop_last=False,
        )
        loader.shard_by_process = True
        loader._shard_info = lambda: (rank, nshards)
        return loader

    seen, total = [], 0
    for rank in range(3):
        loader = loader_for(rank, 3)
        assert len(loader) == 2  # ceil(ceil(8/3)=3 / bs 2) on every shard
        ids = []
        for batch in loader:
            ids.extend(np.round(batch["2d_keypoints"][:, 0, 0], 3).tolist())
        assert len(ids) == 3  # equal shard lengths
        total += len(ids)
        seen.append(set(ids))
    union = set().union(*seen)
    assert len(union) == 8  # every sample evaluated
    assert total == 9  # exactly one padded duplicate


def test_tp_rules_do_not_shard_pose_heads():
    """The Megatron rules target encoder blocks; the pose heads' own
    fc1/fc2 Dense layers must stay replicated (sharding the trainable head
    puts per-step collectives in the hottest gradient path)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    from dino_pose_tpu.core.sharding import tree_shardings
    from dino_pose_tpu.models import registry

    model = registry.create_model_from_config(
        {"model_name": "test/vit-tiny", "num_keypoints": 24,
         "output_heatmap_size": 48},
        pretrained=False,
    )
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    sh = tree_shardings(model.variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    from dino_pose_tpu.core.sharding import _path_str

    sharded = {_path_str(p) for p, s in flat if s.spec != P()}
    assert sharded  # the encoder rules did engage
    assert all(path.startswith("backbone/layer") for path in sharded), sharded

    # A mesh without a 'model' axis must fall back to replication, not
    # KeyError (the documented any-mesh contract).
    data_mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    sh2 = tree_shardings(model.variables["params"], data_mesh)
    assert all(s.spec == P() for _, s in jax.tree_util.tree_flatten_with_path(sh2)[0])
