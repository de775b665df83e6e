"""DINOv2 backbone parity vs HuggingFace ``Dinov2Model`` (random weights).

No network access is needed: the torch model is built from a config and its
random state dict is imported through the bridge.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dino_pose_tpu.io import torch_bridge as tb
from dino_pose_tpu.models.vit import Dinov2Backbone, ViTConfig


def make_hf_model(hidden=64, layers=2, heads=2, image_size=518):
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        mlp_ratio=4,
        patch_size=14,
        image_size=image_size,
        layerscale_value=1.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Dinov2Model(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("input_size", [224, 518])
def test_backbone_matches_hf(input_size):
    hf = make_hf_model()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    # Make LayerScale non-trivial so the test exercises it.
    for k in list(state):
        if "lambda1" in k:
            state[k] = np.random.default_rng(1).uniform(0.5, 1.5, state[k].shape).astype(np.float32)
    hf.load_state_dict({k: torch.tensor(v) for k, v in state.items()})

    cfg = ViTConfig(hidden_size=64, num_layers=2, num_heads=2)
    model = Dinov2Backbone(cfg)
    x = np.random.default_rng(2).standard_normal((2, 3, input_size, input_size)).astype(np.float32)

    variables = model.init(jax.random.key(0), jnp.zeros((1, input_size, input_size, 3)))
    params = tb.import_params(variables["params"], state, tb.vit_rules(cfg.num_layers))

    tokens, (hp, wp) = model.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    with torch.no_grad():
        want = hf(torch.tensor(x)).last_hidden_state.numpy()

    assert tokens.shape == want.shape
    assert (hp, wp) == (input_size // 14, input_size // 14)
    np.testing.assert_allclose(np.asarray(tokens), want, atol=2e-4, rtol=1e-3)


def test_lora_zero_init_is_identity():
    """With lora_B = 0 the LoRA backbone must equal the plain backbone."""
    cfg = ViTConfig(hidden_size=64, num_layers=2, num_heads=2)
    cfg_lora = ViTConfig(hidden_size=64, num_layers=2, num_heads=2, lora_layers=(1,))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 224, 224, 3)).astype(np.float32)
    )
    base = Dinov2Backbone(cfg)
    lora = Dinov2Backbone(cfg_lora)
    vb = base.init(jax.random.key(0), x)
    vl = lora.init(jax.random.key(0), x)

    # Copy shared params from base into the lora tree.
    from flax import traverse_util

    flat_b = traverse_util.flatten_dict(vb["params"])
    flat_l = dict(traverse_util.flatten_dict(vl["params"]))
    for k, v in flat_b.items():
        flat_l[k] = v
    params_l = traverse_util.unflatten_dict(flat_l)

    out_b, _ = base.apply(vb, x)
    out_l, _ = lora.apply({"params": params_l}, x)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_l), atol=1e-6)

    # And the exported torch keys carry the reference LoRA naming.
    rules = tb.vit_rules(2, lora_layers=(1,), torch_prefix="backbone.")
    exported = tb.export_params(params_l, rules)
    assert "backbone.encoder.layer.1.attention.lora_output.lora_A" in exported
    assert (
        "backbone.encoder.layer.1.attention.original_attention.attention.query.weight"
        in exported
    )


def test_hidden_dropout_applies_in_blocks():
    """hidden_dropout > 0 must actually drop inside blocks during training
    (HF Dinov2SelfOutput semantics) — it used to fall through to block_math,
    which has no RNG, silently losing the requested regularisation."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dino_pose_tpu.models.vit import VIT_PRESETS, Dinov2Backbone

    cfg = dataclasses.replace(VIT_PRESETS["test/vit-tiny"], hidden_dropout=0.5)
    module = Dinov2Backbone(cfg)
    x = jnp.ones((1, cfg.patch_size * 4, cfg.patch_size * 4, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x, deterministic=True)

    def run(seed, det):
        out, _ = module.apply(
            variables, x, deterministic=det,
            rngs={} if det else {"dropout": jax.random.key(seed)},
        )
        return np.asarray(out)

    d1, d2 = run(1, False), run(2, False)
    assert not np.allclose(d1, d2)  # different masks -> different outputs
    np.testing.assert_array_equal(run(0, True), run(0, True))  # eval: exact


def test_lora_and_unfreeze_are_mutually_exclusive():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import pytest

    from dino_pose_tpu.models.vit import VIT_PRESETS, Dinov2Backbone

    cfg = dataclasses.replace(
        VIT_PRESETS["test/vit-tiny"], lora_layers=(1,), num_unfrozen_layers=1
    )
    module = Dinov2Backbone(cfg)
    x = jnp.ones((1, cfg.patch_size * 2, cfg.patch_size * 2, 3), jnp.float32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        module.init(jax.random.key(0), x, deterministic=True)
