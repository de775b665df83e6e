"""Pose-head numerical parity against the reference torch implementation.

The reference's ``model/pose_heads.py`` depends only on torch, so we import it
straight from the read-only mount and compare: its randomly-initialised state
dict is bridged into our Flax head and both are evaluated on the same input.
This pins the full topology (hourglass wiring, deconv geometry, BN placement,
final resize) and the bridge key mapping in one shot.
"""

import importlib.util
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dino_pose_tpu.io import torch_bridge as tb
from dino_pose_tpu.models.heads import SpatialAwarePoseHeads, upsampling_plan

REF = pathlib.Path("/root/reference/model/pose_heads.py")


def load_reference_heads():
    spec = importlib.util.spec_from_file_location("ref_pose_heads", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
# Spatial size must be divisible by 4 (the hourglass down/up pyramid needs the
# skip and upsampled paths to land on the same shape — true of the reference
# too). 16 = DINOv2 at 224^2; 8 = FastViT at 256^2 (final stage stride 32).
@pytest.mark.parametrize("spatial,feat", [(16, 64), (8, 96)])
def test_spatial_aware_heads_match_reference(spatial, feat):
    ref = load_reference_heads()
    torch.manual_seed(0)
    torch_heads = ref.SpatialAwarePoseHeads(
        feat_channels=feat,
        num_keypoints=24,
        heatmap_size=48,
        spatial_input_size=spatial,
        z_coord_config={"hidden_dims": (1024, 512, 256), "dropout_rate": 0.1},
    )
    torch_heads.eval()
    state = {k: v.detach().numpy() for k, v in torch_heads.state_dict().items()}

    module = SpatialAwarePoseHeads(
        num_keypoints=24, heatmap_size=48, spatial_input_size=spatial
    )
    x = np.random.default_rng(0).standard_normal((2, feat, spatial, spatial)).astype(
        np.float32
    )
    variables = module.init(
        jax.random.key(0),
        jnp.zeros((1, spatial, spatial, feat)),
        train=False,
    )
    n_up = len(upsampling_plan(spatial, 48))
    rules = tb.spatial_heads_rules((), "", num_up_stages=n_up)
    variables = tb.import_params(variables, state, rules)

    got_hm, got_z = module.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )
    with torch.no_grad():
        want_hm, want_z = torch_heads(torch.tensor(x))

    got_hm = np.transpose(np.asarray(got_hm), (0, 3, 1, 2))
    assert got_hm.shape == tuple(want_hm.shape) == (2, 24, 48, 48)
    np.testing.assert_allclose(got_hm, want_hm.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_z), want_z.numpy(), atol=5e-4, rtol=1e-3)


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_exported_state_dict_loads_into_reference_heads():
    """Export path: our params must load into the torch reference with zero
    missing/unexpected keys (the CoreML-parity contract)."""
    ref = load_reference_heads()
    module = SpatialAwarePoseHeads(num_keypoints=24, heatmap_size=48, spatial_input_size=16)
    variables = module.init(
        jax.random.key(1), jnp.zeros((1, 16, 16, 64)), train=False
    )
    rules = tb.spatial_heads_rules((), "", num_up_stages=len(upsampling_plan(16, 48)))
    state = tb.export_params(variables, rules)
    for k in tb.num_batches_tracked_keys(rules):
        state[k] = np.zeros((), dtype=np.int64)

    torch_heads = ref.SpatialAwarePoseHeads(
        feat_channels=64,
        num_keypoints=24,
        heatmap_size=48,
        spatial_input_size=16,
        z_coord_config={"hidden_dims": (1024, 512, 256), "dropout_rate": 0.1},
    )
    missing, unexpected = torch_heads.load_state_dict(
        {k: torch.tensor(v) for k, v in state.items()}, strict=True
    )
    assert not missing and not unexpected
