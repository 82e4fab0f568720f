"""Driver-surface tests: the multichip dry run must work on the CPU mesh."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out
    assert "'data': 4" in out and "'model': 2" in out


def test_dryrun_multichip_2(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(2)
    assert "dryrun_multichip OK" in capsys.readouterr().out
