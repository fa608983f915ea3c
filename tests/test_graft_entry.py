"""Driver contract: entry() compiles single-chip; dryrun_multichip executes
the full sharded step on the virtual 8-device mesh."""

import sys
import pathlib

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    X_half, ub = out
    assert X_half.shape[0] == args[0].Kp
    assert np.isfinite(float(ub))


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
