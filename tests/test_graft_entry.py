"""Driver-contract regression tests: entry() must stay jittable and
dryrun_multichip must run a full distributed SCG step on the CPU mesh."""

import sys
import os

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_lowers_and_runs_small():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    f = float(out[0])
    assert f == f  # finite, not NaN
    grads = out[1]
    assert grads.glob.z.shape == args[0].glob.z.shape


def test_dryrun_multichip_eight():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # conftest already provides 8 CPU devices
