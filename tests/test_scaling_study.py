"""The virtual-mesh scaling harness (tools/scaling_study.py) — VERDICT r3 #1.

Checks the study driver end-to-end at tiny sizes: one subprocess per mesh
size, well-formed legs, positive throughput, overhead efficiencies relative
to the 1-device leg.  Thresholds are deliberately loose (this is a 2-vCPU
host); the compute-dominated numbers live in BASELINE.md "Scaling study".
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_scaling_study_runs_and_reports():
    from scaling_study import run_study

    study = run_study(devices=(1, 2), size=64, tiles=8, tile=16, iters=5,
                      quiet=True)
    assert study["kind"] == "virtual_mesh_fixed_total_work"
    assert [leg["n_devices"] for leg in study["legs"]] == [1, 2]
    for leg in study["legs"]:
        assert leg["tv_sharded_iter_per_s"] > 0
        assert leg["consensus_iter_per_s"] > 0
        assert leg["tv_sharded_overhead_eff"] > 0
        assert leg["consensus_overhead_eff"] > 0
    # the 1-device leg is its own baseline by construction
    assert study["legs"][0]["tv_sharded_overhead_eff"] == 1.0
    assert study["legs"][0]["consensus_overhead_eff"] == 1.0
