"""Driver entry points: entry() compiles and runs; dryrun uses this process's
8-device CPU mesh."""

import sys

import jax
import numpy as np


sys.path.insert(0, ".")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    assert out.shape == args[0].shape
    assert out.dtype == args[0].dtype
    assert np.asarray(out).std() < np.asarray(args[0]).std()  # it blurred


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts max diff <= 1 internally


def test_dryrun_multichip_small_counts():
    import __graft_entry__ as g

    g.dryrun_multichip(2)
    g.dryrun_multichip(1)
