"""Driver entry points: the multichip dry run must compile + execute."""


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
