"""Driver contract: entry() traces; dryrun_multichip runs on the 8-dev mesh."""

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
import pytest

# Compiles the flagship dinov2-small forward + the multichip dryrun.
pytestmark = pytest.mark.slow


def test_entry_traces():
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    heatmaps, z = out
    assert heatmaps.shape == (1, 24, 48, 48)
    assert z.shape == (1, 24)


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
