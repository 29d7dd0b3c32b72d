"""Driver contract: entry() compiles single-device; dryrun_multichip runs a
real dp+tp-sharded train step on the virtual 8-device CPU mesh."""

import jax

import __graft_entry__ as graft


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 300, 4)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    graft.dryrun_multichip(1)
