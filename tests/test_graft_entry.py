"""Driver entry points: the multichip dry run must compile + execute."""

import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
