"""Driver-contract checks: entry() compiles and runs; dryrun_multichip
exercises real shardings on the virtual 8-device CPU mesh."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    image, semantics, depth = out
    assert image.shape == (1024, 3)
    assert semantics.shape == (1024, 40)
    assert depth.shape == (1024,)
    assert np.isfinite(np.asarray(image)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # asserts internally; raises on failure
