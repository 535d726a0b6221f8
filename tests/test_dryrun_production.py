"""The production-shape multichip dryrun must not rot (VERDICT r3 next #6).

Runs the driver-facing `dryrun_multichip` at its DEFAULT (production)
configuration — k=13/stride=10, S=512/W=128 DP ladder, real -x pacbio
preset thresholds — over the 8-device virtual CPU mesh: sharded pw
one-shot, two-phase probe/extend, and a template-sharded cns slice all
compile and execute at the same program shapes the full-scale runs use.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_dryrun_production_shapes():
    import __graft_entry__ as ge

    assert os.environ.get("MECAT_DRYRUN_TOY") != "1"
    ge.dryrun_multichip(8)  # default IS the production twin; asserts inside
