"""MIP solver tests.

Golden values mirror the reference MIP suites:
cpp/tests/mip/empty_fixed_problems_test.cu (fixed-problem=65, infeasible,
empty-problem-obj=81, empty-problem-objective-vars=-2, empty-max=11),
cpp/tests/mip/termination_test.cu (sudoku=0, bb_optimality=2,
presolve-infeasible), datasets/mip/sample.mps header (-28).
"""

import numpy as np
import pytest

from cuopt_tpu import constants as C
from cuopt_tpu.io import parse_mps
from cuopt_tpu.linear_programming import MIPSolverSettings, Solve


def mip_settings(time_limit=240.0, **kw):
    # generous limits: XLA compiles on this host go through a remote
    # compile service with 10-300s latency swings (see conftest note)
    s = MIPSolverSettings()
    s.time_limit = time_limit
    s.log_to_console = False
    for k, v in kw.items():
        setattr(s, k, v)
    return s


GOLDEN = [
    ("fixed-problem.mps", 65.0),
    ("bb_optimality.mps", 2.0),
    ("sample.mps", -28.0),
    ("empty-problem-obj.mps", 81.0),
    ("empty-problem-objective-vars.mps", -2.0),
    ("empty-max-problem-objective-vars.mps", 11.0),
    ("trivial-presolve-no-obj-vars.mps", 0.0),
]

INFEASIBLE = ["fixed-problem-infeas.mps", "presolve-infeasible.mps"]


@pytest.mark.parametrize("fname,expected", GOLDEN)
def test_mip_golden(mip_datasets, fname, expected):
    p = parse_mps(str(mip_datasets / fname))
    sol = Solve(p, mip_settings())
    assert sol.get_termination_status() == \
        C.CUOPT_TERIMINATION_STATUS_OPTIMAL
    assert abs(sol.get_primal_objective() - expected) < 1e-4 * max(
        1.0, abs(expected)
    )


@pytest.mark.parametrize("fname", INFEASIBLE)
def test_mip_infeasible(mip_datasets, fname):
    p = parse_mps(str(mip_datasets / fname))
    sol = Solve(p, mip_settings())
    assert sol.get_termination_status() == \
        C.CUOPT_TERIMINATION_STATUS_INFEASIBLE


def test_sudoku(mip_datasets):
    # reference termination_test.cu: presolve_optimality_test expects 0
    p = parse_mps(str(mip_datasets / "sudoku.mps"))
    sol = Solve(p, mip_settings(time_limit=120.0))
    assert sol.get_termination_status() == \
        C.CUOPT_TERIMINATION_STATUS_OPTIMAL
    assert abs(sol.get_primal_objective()) < 1e-6


def test_integrality_of_solution(mip_datasets):
    p = parse_mps(str(mip_datasets / "sample.mps"))
    sol = Solve(p, mip_settings())
    x = sol.get_primal_solution()
    is_int = p.variable_types == "I"
    assert np.all(np.abs(x[is_int] - np.round(x[is_int])) < 1e-6)
    # constraints satisfied
    act = p.to_dense() @ x
    assert np.all(act <= p.constraint_upper_bounds + 1e-6)
    assert np.all(act >= p.constraint_lower_bounds - 1e-6)


def test_heuristics_only(mip_datasets):
    p = parse_mps(str(mip_datasets / "sample.mps"))
    sol = Solve(p, mip_settings(heuristics_only=True))
    assert sol.get_termination_status() in (
        C.CUOPT_TERIMINATION_STATUS_FEASIBLE_FOUND,
        C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
    )


def test_mip_gap_and_bound(mip_datasets):
    p = parse_mps(str(mip_datasets / "sample.mps"))
    sol = Solve(p, mip_settings())
    assert sol.get_mip_gap() <= 1e-4
    # minimize: bound <= objective
    assert sol.get_solution_bound() <= sol.get_primal_objective() + 1e-6


def test_presolve_bound_propagation():
    from cuopt_tpu.mip.presolve import propagate_bounds

    # x + y <= 3, x >= 2  ->  y <= 1 (integers)
    offsets = np.array([0, 2])
    indices = np.array([0, 1])
    values = np.array([1.0, 1.0])
    res = propagate_bounds(
        offsets, indices, values,
        np.array([-np.inf]), np.array([3.0]),
        np.array([2.0, 0.0]), np.array([np.inf, np.inf]),
        np.array([True, True]),
    )
    assert not res.infeasible
    assert res.uv[1] <= 1.0 + 1e-9

    # infeasible: x + y <= 1 with x,y >= 1
    res2 = propagate_bounds(
        offsets, indices, values,
        np.array([-np.inf]), np.array([1.0]),
        np.array([1.0, 1.0]), np.array([np.inf, np.inf]),
        np.array([True, True]),
    )
    assert res2.infeasible


def test_feasibility_jump_finds_solution():
    """FJ on a small covering problem: min sum x, every pair covered."""
    from cuopt_tpu.mip.feasibility_jump import run_feasibility_jump
    from cuopt_tpu.problem.data_model import OptimizationProblem

    rng = np.random.default_rng(3)
    m, n = 12, 8
    A = (rng.random((n, m)) < 0.4).astype(float)
    A[:, 0] = 1.0  # ensure coverable
    prob = OptimizationProblem.from_dense(
        A, np.ones(m), np.ones(n), np.full(n, np.inf),
        variable_lower=np.zeros(m), variable_upper=np.ones(m),
        variable_types=np.full(m, "I", "U1"),
    )
    x0 = np.zeros(m)
    x, obj, found = run_feasibility_jump(prob, [x0], 5.0)
    assert found
    assert np.all(A @ x >= 1.0 - 1e-6)
