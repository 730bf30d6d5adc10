"""Driver contract: entry() compiles; dryrun_multichip runs on 8 fake devices."""

import pytest

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_jits():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 96, 96, 3)


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
