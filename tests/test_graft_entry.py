"""Driver-contract tests: entry() compiles and dryrun_multichip runs."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_is_finite():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert float(loss) > 0  # perturbed pose -> nonzero loss


def test_dryrun_multichip_eight_devices():
    graft.dryrun_multichip(8)
