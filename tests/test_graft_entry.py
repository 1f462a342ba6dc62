"""Driver interface regression: __graft_entry__ must always work.

The round driver compile-checks entry() single-chip and executes
dryrun_multichip(N) on a virtual CPU mesh; breaking either silently
fails the round, so they are gated here (slow: full-width model and a
sharded train-step compile on CPU).
"""

import sys
from pathlib import Path

import jax
import pytest
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge


@pytest.mark.slow
def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 512, 512, 1)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    assert 0.0 <= arr.min() and arr.max() <= 1.0


@pytest.mark.slow
def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
