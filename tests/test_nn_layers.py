"""Numerical parity of the NN building blocks against torch functional ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dino_pose_tpu.nn import layers as L


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def test_dense_matches_torch_linear(rng):
    x = rng.standard_normal((4, 7)).astype(np.float32)
    w = rng.standard_normal((5, 7)).astype(np.float32)  # torch (out, in)
    b = rng.standard_normal((5,)).astype(np.float32)
    mod = L.Dense(features=5)
    params = {"params": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = F.linear(torch.tensor(x), torch.tensor(w), torch.tensor(b)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("groups", [1, 8])
def test_conv_matches_torch_conv2d(rng, groups):
    in_ch, out_ch = 8, 16
    x = rng.standard_normal((2, in_ch, 9, 9)).astype(np.float32)
    w = rng.standard_normal((out_ch, in_ch // groups, 3, 3)).astype(np.float32)
    b = rng.standard_normal((out_ch,)).astype(np.float32)
    mod = L.Conv(
        features=out_ch, kernel_size=(3, 3), strides=(2, 2), padding=(1, 1),
        feature_group_count=groups,
    )
    kernel = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}}
    got = to_nchw(np.asarray(mod.apply(params, jnp.asarray(to_nhwc(x)))))
    want = F.conv2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2, padding=1,
        groups=groups,
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize(
    "k,s,p,size", [(4, 3, 1, 16), (4, 1, 1, 47), (2, 2, 0, 4), (3, 2, 1, 6)]
)
def test_conv_transpose_matches_torch(rng, k, s, p, size):
    in_ch, out_ch = 6, 5
    x = rng.standard_normal((2, in_ch, size, size)).astype(np.float32)
    w = rng.standard_normal((in_ch, out_ch, k, k)).astype(np.float32)
    b = rng.standard_normal((out_ch,)).astype(np.float32)
    mod = L.ConvTranspose(
        features=out_ch, kernel_size=(k, k), strides=(s, s), padding=(p, p)
    )
    # torch (in,out,kh,kw) -> equivalent-conv HWIO with spatial flip.
    kernel = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}}
    got = to_nchw(np.asarray(mod.apply(params, jnp.asarray(to_nhwc(x)))))
    want = F.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=s, padding=p
    ).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_batchnorm_train_and_eval_match_torch(rng):
    ch = 5
    tbn = torch.nn.BatchNorm2d(ch)
    tbn.weight.data = torch.tensor(rng.standard_normal(ch).astype(np.float32))
    tbn.bias.data = torch.tensor(rng.standard_normal(ch).astype(np.float32))

    mod = L.BatchNorm()
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": {"mean": jnp.zeros(ch), "var": jnp.ones(ch)},
    }

    # Two training steps: outputs and running stats must track torch.
    for step in range(2):
        x = rng.standard_normal((3, ch, 4, 4)).astype(np.float32)
        want = tbn(torch.tensor(x)).detach().numpy()
        got_nhwc, mutated = mod.apply(
            variables,
            jnp.asarray(to_nhwc(x)),
            use_running_average=False,
            mutable=["batch_stats"],
        )
        variables = {"params": variables["params"], **mutated}
        np.testing.assert_allclose(to_nchw(np.asarray(got_nhwc)), want, atol=1e-4)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        atol=1e-5,
    )

    # Eval mode uses running stats.
    tbn.eval()
    x = rng.standard_normal((2, ch, 4, 4)).astype(np.float32)
    want = tbn(torch.tensor(x)).detach().numpy()
    got = mod.apply(variables, jnp.asarray(to_nhwc(x)), use_running_average=True)
    np.testing.assert_allclose(to_nchw(np.asarray(got)), want, atol=1e-4)


@pytest.mark.parametrize("in_size,out_size", [(37, 16), (37, 37), (7, 20)])
def test_cubic_resize_matrix_matches_torch_bicubic(rng, in_size, out_size):
    x = rng.standard_normal((1, 3, in_size, in_size)).astype(np.float32)
    want = F.interpolate(
        torch.tensor(x), size=(out_size, out_size), mode="bicubic",
        align_corners=False,
    ).numpy()
    m = L.cubic_resize_matrix(in_size, out_size)
    got = np.einsum("oh,pw,bchw->bcop", m, m, x)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("in_size,out_size", [(42, 48), (41, 48), (48, 48)])
def test_bilinear_resize_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, 4, in_size, in_size)).astype(np.float32)
    want = F.interpolate(
        torch.tensor(x), size=(out_size, out_size), mode="bilinear",
        align_corners=False,
    ).numpy()
    got = to_nchw(
        np.asarray(L.bilinear_resize(jnp.asarray(to_nhwc(x)), (out_size, out_size)))
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_nearest_resize_matrix_matches_torch(rng):
    x = rng.standard_normal((1, 2, 37, 37)).astype(np.float32)
    want = F.interpolate(torch.tensor(x), size=(16, 16), mode="nearest").numpy()
    m = L.nearest_resize_matrix(37, 16)
    got = np.einsum("oh,pw,bchw->bcop", m, m, x)
    np.testing.assert_allclose(got, want, atol=1e-6)
