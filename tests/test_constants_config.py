import numpy as np

from dino_pose_tpu import config as cfg
from dino_pose_tpu import constants as C


def test_flip_perm_is_involution():
    # Flipping twice must restore the original ordering.
    perm = C.FLIP_PERM
    assert perm.shape == (24,)
    assert np.array_equal(perm[perm], np.arange(24))


def test_flip_perm_swaps_left_right():
    assert perm_of(C.KeyPoints.RIGHT_SHOULDER) == C.KeyPoints.LEFT_SHOULDER
    assert perm_of(C.KeyPoints.LEFT_TOE) == C.KeyPoints.RIGHT_TOE
    assert perm_of(C.KeyPoints.TOP) == C.KeyPoints.TOP
    assert perm_of(C.KeyPoints.SPINE) == C.KeyPoints.SPINE


def perm_of(k):
    return C.FLIP_PERM[int(k)]


def test_com_weights_sum_to_one():
    assert abs(C.COM_WEIGHTS.sum() - 1.0) < 1e-6
    assert C.COM_WEIGHTS.shape == (24,)


def test_skeleton_links_reference_valid_indices():
    for a, b, color in C.SKELETON_LINKS:
        assert 0 <= int(a) < 24 and 0 <= int(b) < 24
        assert color in {"yellow", "pink", "green", "blue"}
    assert len(C.SKELETON_LINKS) == 23


def test_default_config_schema_matches_reference_keys():
    d, t, p, m = cfg.get_default_configs()
    assert set(d) == {
        "train_images_dir",
        "train_annotation_json",
        "val_images_dir",
        "val_annotation_json",
    }
    assert set(t) == {
        "batch_size",
        "learning_rate",
        "weight_decay",
        "num_epochs",
        "multiprocessing_num",
        "save_freq",
        "checkpoint_dir",
    }
    assert {
        "pre_crop",
        "is_scale",
        "random_resize_min",
        "random_resize_max",
        "is_rotate",
        "rotate_min_degree",
        "rotate_max_degree",
        "is_flipping",
        "is_resize_shortest_edge",
        "is_crop",
        "is_occultation",
        "heatmap_std",
    } <= set(p)
    assert {
        "model_name",
        "load_model",
        "num_keypoints",
        "unfreeze_last_n_layers",
        "use_lora",
        "lora_rank",
        "lora_alpha",
        "lora_dropout",
        "output_heatmap_size",
    } <= set(m)
    # Reference default values.
    assert t["batch_size"] == 32 and t["learning_rate"] == 3e-5
    assert m["num_keypoints"] == 24 and m["output_heatmap_size"] == 48


def test_config_round_trip_and_unknown_keys_ignored():
    d, t, p, m = cfg.get_default_configs()
    m2 = dict(m, future_key=123)
    parsed = cfg.from_dicts(d, t, p, m2)
    assert parsed.model.num_keypoints == 24
    back = cfg.as_dicts(parsed)
    assert back[3]["model_name"] == m["model_name"]


def test_load_config_file(tmp_path):
    f = tmp_path / "my_config.py"
    f.write_text(
        "def get_default_configs():\n"
        "    return ({'train_images_dir': 'x', 'train_annotation_json': 'y',"
        " 'val_images_dir': '', 'val_annotation_json': ''},"
        " {'batch_size': 4, 'learning_rate': 1e-3, 'weight_decay': 0.0,"
        " 'num_epochs': 1, 'multiprocessing_num': 0, 'save_freq': 1,"
        " 'checkpoint_dir': 'c'},"
        " {}, {'model_name': 'facebook/dinov2-small', 'load_model': '',"
        " 'num_keypoints': 24, 'output_heatmap_size': 48})\n"
    )
    d, t, p, m = cfg.load_config_file(str(f))
    assert t["batch_size"] == 4 and d["train_images_dir"] == "x"
