"""Driver-contract checks for __graft_entry__.py (compile + tiny dryrun)."""

import sys

import jax
import pytest


def _load():
    sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__))))
    import __graft_entry__
    return __graft_entry__


def test_entry_compiles():
    mod = _load()
    fn, args = mod.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None


def test_dryrun_multichip_8():
    mod = _load()
    mod.dryrun_multichip(8)
