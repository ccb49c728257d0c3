"""Full-size multi-chip dryrun (round-1 verdict item 7): compile + run ONE
sharded train step with the real IA-SSD KITTI shapes (N=16384) on the
virtual CPU mesh — catches sharding-induced recompiles/OOM that the tiny
driver gate hides."""
import pytest


@pytest.mark.slow
def test_dryrun_multichip_full_size():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(2, full_size=True)
