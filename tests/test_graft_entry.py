"""The driver contract: entry() compiles single-chip; dryrun_multichip(8)
jits + executes the full sharded training step on the virtual CPU mesh."""

import sys
import os

import pytest

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    assert out.shape == (64 * 36, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
