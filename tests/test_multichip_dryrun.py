"""Regression coverage for the driver's multichip entry points.

The fast test pins the tiny-shape compile path; the slow test runs the
recipe-shape (512^2 student, 20 crops @224) dp x fsdp x tp step and asserts
hybrid-mesh == single-device loss — the full `dryrun_multichip` contract the
driver records in MULTICHIP_r*.json. Deselect with `-m "not slow"` for fast
local iteration.
"""

import pytest


def test_dryrun_multichip_tiny():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8, full=False)


@pytest.mark.slow
def test_dryrun_multichip_full_recipe_shapes():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8, full=True)
