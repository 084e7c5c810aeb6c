"""Driver-contract tests for __graft_entry__.py.

The round driver imports the module and calls entry() / dryrun_multichip(8)
directly; these tests pin that contract on the 8-device CPU mesh the
conftest provisions (the same virtual topology the driver uses).
"""

import sys

import jax
import pytest


def _load():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    return __graft_entry__


@pytest.mark.slow
def test_entry_compiles_and_runs():
    g = _load()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 2, 40000)
    assert bool(jax.numpy.isfinite(out).all())


@pytest.mark.slow
def test_dryrun_multichip_inprocess():
    # conftest already provisioned 8 CPU devices, so the dryrun must use
    # them in-process (no subprocess fallback needed)
    g = _load()
    g.dryrun_multichip(8)
