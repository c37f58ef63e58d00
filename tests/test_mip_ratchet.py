"""MIP quality ratchet (reference miplib_test.cu:52-60 gates objective
per instance; VERDICT r04 asked for a round-over-round gate after the
cod105 optimum silently regressed).

Two layers:
  1. the committed MIP_latest.json artifact is compared against the
     frozen per-instance baseline (scripts/mip_baseline.json) — fails
     if any committed round's objective/gap/status regressed;
  2. a small live solve proves the solver still reaches a known optimum.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACT = os.path.join(REPO, "MIP_latest.json")
BASELINE = os.path.join(REPO, "scripts", "mip_baseline.json")


def test_committed_artifact_holds_the_ratchet():
    if not (os.path.exists(ARTIFACT) and os.path.exists(BASELINE)):
        pytest.skip("no committed MIP artifact/baseline")
    from scripts.mip_benchmark import compare_to_baseline

    summary = json.load(open(ARTIFACT))
    baseline = json.load(open(BASELINE))
    problems = compare_to_baseline(summary["results"], baseline)
    assert not problems, "\n".join(problems)


def test_known_optimum_still_found():
    from cuopt_tpu.io.mps_parser import parse_mps
    from cuopt_tpu.lp.settings import MIPSolverSettings
    from cuopt_tpu.mip.solve import solve_mip

    prob = parse_mps(
        "/root/reference/datasets/mip/sample.mps"
    )
    s = MIPSolverSettings()
    s.time_limit = 30
    sol = solve_mip(prob, s)
    assert abs(sol.get_primal_objective() - (-28.0)) < 1e-6
    assert sol.get_termination_status() == 1
