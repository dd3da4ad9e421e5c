"""Simulate the driver: compile-check entry() and run dryrun_multichip(8)."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    u, v, inval = jax.jit(fn)(*args)
    assert u.shape == v.shape == inval.shape
    u = np.asarray(u)
    assert np.isfinite(u).all()
    # known flow in the example args
    sel = ~np.asarray(inval)
    assert abs(np.median(u[sel]) - 3.3) < 0.1


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip(n):
    ge.dryrun_multichip(n)
