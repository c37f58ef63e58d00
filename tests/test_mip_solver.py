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


def test_feasibility_pump_finds_feasible():
    """FP on a pure feasibility problem (zero objective, equality-ish
    constraints) where naive roundings fail often."""
    from cuopt_tpu.mip.feasibility_pump import feasibility_pump
    from cuopt_tpu.problem.data_model import OptimizationProblem

    rng = np.random.default_rng(7)
    m, n = 12, 8
    A = rng.integers(-3, 4, (n, m)).astype(float)
    x_true = rng.integers(0, 5, m).astype(float)
    b = A @ x_true
    rows = np.repeat(np.arange(n), m)
    p = OptimizationProblem(
        offsets=np.arange(0, n * m + 1, m),
        indices=np.tile(np.arange(m), n),
        values=A.ravel(),
        objective_coefficients=np.zeros(m),
        constraint_lower_bounds=b - 0.5,
        constraint_upper_bounds=b + 0.5,
        variable_lower_bounds=np.zeros(m),
        variable_upper_bounds=np.full(m, 6.0),
        variable_types=np.full(m, "I", "U1"),
        row_types=np.full(n, "E", "U1"),
        rhs=b,
    )
    x0 = np.clip(x_true + rng.uniform(-0.45, 0.45, m), 0, 6)
    x, obj, found = feasibility_pump(p, x0, time_budget_s=60.0)
    assert found
    act = A @ x
    assert np.all(act >= b - 0.5 - 1e-6) and np.all(act <= b + 0.5 + 1e-6)


def test_line_segment_search():
    from cuopt_tpu.mip.feasibility_pump import line_segment_search
    from cuopt_tpu.problem.data_model import OptimizationProblem

    # min -x1 - x2 s.t. x1 + x2 <= 7.5, x in [0, 5], integer
    p = OptimizationProblem(
        offsets=np.array([0, 2]),
        indices=np.array([0, 1]),
        values=np.array([1.0, 1.0]),
        objective_coefficients=np.array([-1.0, -1.0]),
        constraint_lower_bounds=np.array([-np.inf]),
        constraint_upper_bounds=np.array([7.5]),
        variable_lower_bounds=np.zeros(2),
        variable_upper_bounds=np.full(2, 5.0),
        variable_types=np.full(2, "I", "U1"),
        row_types=np.array(["L"], "U1"),
        rhs=np.array([7.5]),
    )
    x, obj, found = line_segment_search(
        p, np.array([0.0, 0.0]), np.array([3.75, 3.75])
    )
    assert found
    assert x[0] + x[1] <= 7.5


def test_incumbent_callbacks(mip_datasets):
    """GetSolutionCallback receives incumbents; SetSolutionCallback can
    inject one (reference incumbent_callback_test.cu + internals.hpp)."""
    from cuopt_tpu.lp.internals import (
        GetSolutionCallback,
        SetSolutionCallback,
    )

    received = []

    class Get(GetSolutionCallback):
        def get_solution(self, solution, solution_cost):
            received.append((solution.copy(), float(solution_cost[0])))

    class Set(SetSolutionCallback):
        def __init__(self):
            self.calls = 0

        def set_solution(self, solution, solution_cost):
            self.calls += 1

    p = parse_mps(str(mip_datasets / "sample.mps"))
    s = mip_settings()
    g, st = Get(), Set()
    s.set_mip_callback(g)
    s.set_mip_callback(st)
    sol = Solve(p, s)
    assert sol.get_termination_status() in (
        C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
        C.CUOPT_TERIMINATION_STATUS_FEASIBLE_FOUND,
    )
    assert len(received) >= 1
    # best received incumbent matches the final solution cost direction
    best = min(c for _, c in received)
    assert best <= max(c for _, c in received) + 1e-9


def test_initial_solution_used(mip_datasets):
    p = parse_mps(str(mip_datasets / "sample.mps"))
    s = mip_settings()
    # sample.mps optimum: x=4, y=2 obj -28 (maximize)
    s.set_initial_solution(np.array([4.0, 2.0]))
    sol = Solve(p, s)
    assert abs(sol.get_primal_objective() - (-28.0)) < 1e-3 or \
        abs(sol.get_primal_objective() - 28.0) < 1e-3


# ---------------------------------------------------------------- probing
def test_probing_fixes_implied_binary():
    """x + y >= 1.5 with x,y binary: probing x=0 forces y>=1.5 -> infeasible
    branch -> x fixed to 1 (and symmetrically y)."""
    import numpy as np
    from cuopt_tpu.mip.presolve import probe_variables

    offsets = np.array([0, 2])
    indices = np.array([0, 1])
    values = np.array([1.0, 1.0])
    lc = np.array([1.5]); uc = np.array([np.inf])
    lv = np.zeros(2); uv = np.ones(2)
    is_int = np.array([True, True])
    r = probe_variables(offsets, indices, values, lc, uc, lv, uv, is_int)
    assert not r.infeasible
    assert r.n_fixed >= 1
    assert np.allclose(r.lv, [1.0, 1.0]) and np.allclose(r.uv, [1.0, 1.0])


def test_probing_detects_infeasible():
    """x + y >= 1.5 and x + y <= 0.5, binaries: both probe branches die."""
    import numpy as np
    from cuopt_tpu.mip.presolve import probe_variables

    offsets = np.array([0, 2, 4])
    indices = np.array([0, 1, 0, 1])
    values = np.array([1.0, 1.0, 1.0, 1.0])
    lc = np.array([1.5, -np.inf]); uc = np.array([np.inf, 0.5])
    lv = np.zeros(2); uv = np.ones(2)
    is_int = np.array([True, True])
    r = probe_variables(offsets, indices, values, lc, uc, lv, uv, is_int)
    assert r.infeasible


def test_trivial_presolve_eliminates_fixed_vars():
    """Variable elimination + CSR compaction (reference
    trivial_presolve.cuh): a MIP with presolve-fixable variables reaches
    the same optimum, reported in full user space."""
    import numpy as np

    from cuopt_tpu import constants as C
    from cuopt_tpu.lp.settings import MIPSolverSettings
    from cuopt_tpu.mip.presolve import eliminate_fixed
    from cuopt_tpu.mip.solve import solve_mip
    from cuopt_tpu.problem.data_model import OptimizationProblem

    # x0 forced to 2 by bounds; x1, x2 binary knapsack
    A = np.array([
        [1.0, 0.0, 0.0],   # x0 = 2 (bounds)
        [1.0, 2.0, 3.0],   # x0 + 2x1 + 3x2 <= 6
    ])
    p = OptimizationProblem.from_dense(
        A,
        c=np.array([1.0, -3.0, -4.0]),
        constraint_lower=np.array([-np.inf, -np.inf]),
        constraint_upper=np.array([np.inf, 6.0]),
        variable_lower=np.array([2.0, 0.0, 0.0]),
        variable_upper=np.array([2.0, 1.0, 1.0]),
        variable_types=np.array(["I", "I", "I"]),
    )
    red = eliminate_fixed(p, p.variable_lower_bounds,
                          p.variable_upper_bounds)
    assert red is not None
    assert len(red.keep) == 2
    # constraint 2 bound shifted by the fixed x0 term: 6 - 2 = 4
    assert red.problem.constraint_upper_bounds[1] == 4.0
    # objective offset picked up the fixed contribution
    assert red.problem.objective_offset == 2.0

    s = MIPSolverSettings()
    s.time_limit = 30
    sol = solve_mip(p, s)
    assert sol.get_termination_status() == \
        C.CUOPT_TERIMINATION_STATUS_OPTIMAL
    x = sol.get_primal_solution()
    assert len(x) == 3
    assert abs(x[0] - 2.0) < 1e-6
    # optimum: 2x1+3x2 <= 4 -> best is x1=0, x2=1 (obj -4) vs x1=1,x2=0
    # (-3); with x1=x2=1 needing 5 > 4. total = 2 - 4 = -2
    assert abs(sol.get_primal_objective() - (-2.0)) < 1e-6


def test_constraint_prop_and_bounds_repair_roundings():
    """Rounding depth (reference local_search/rounding/): propagation-
    aware rounding respects implications; bounds-repair fixes a violated
    row by moving the highest-leverage variable."""
    import numpy as np

    from cuopt_tpu.mip.rounding import (
        bounds_repair_rounding,
        constraint_prop_rounding,
        violation,
    )
    from cuopt_tpu.problem.data_model import OptimizationProblem

    # x0 + x1 <= 1 (binaries), x2 continuous in [0, 5]; relaxation point
    # (0.5, 0.5, 2.5) would naively round to (0,0) or (1,1)
    A = np.array([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    p = OptimizationProblem.from_dense(
        A,
        c=np.array([-1.0, -1.0, 0.0]),
        constraint_lower=np.array([-np.inf, -np.inf]),
        constraint_upper=np.array([1.0, 5.0]),
        variable_lower=np.zeros(3),
        variable_upper=np.array([1.0, 1.0, 5.0]),
        variable_types=np.array(["I", "I", "C"]),
    )
    x = constraint_prop_rounding(p, np.array([0.5, 0.5, 2.5]))
    assert x is not None
    assert violation(p, x) <= 1e-6  # propagation avoided (1,1)

    # bounds repair: start from the infeasible (1,1,2.5)
    xr = bounds_repair_rounding(p, np.array([1.0, 1.0, 2.5]))
    assert violation(p, xr) <= 1e-6
    assert xr[0] + xr[1] <= 1 + 1e-9


def test_propagation_free_variable_rows():
    """Regression: rows containing FREE variables must not produce
    implied bounds (the old ±1e20 sentinel arithmetic absorbed the
    finite terms and fabricated bounds that cut off the optimum —
    observed on neos5-free-bound.mps)."""
    import numpy as np

    from cuopt_tpu.mip.presolve import propagate_bounds

    # x0 free, x1 in [0, 10]; row: x0 + x1 <= 5 -> implies x1 <= 5?? NO:
    # x0 can be arbitrarily negative, so x1 keeps [0, 10]. And x0 gets
    # NO upper bound from the row either (x1 >= 0 gives x0 <= 5).
    offsets = np.array([0, 2])
    indices = np.array([0, 1])
    values = np.array([1.0, 1.0])
    res = propagate_bounds(
        offsets, indices, values,
        np.array([-np.inf]), np.array([5.0]),
        np.array([-np.inf, 0.0]), np.array([np.inf, 10.0]),
        np.array([False, False]),
    )
    assert not res.infeasible
    # x0's upper bound IS implied (resid of x1's min = 0): x0 <= 5
    assert res.uv[0] == 5.0
    assert not np.isfinite(res.lv[0])
    # x1 must NOT be tightened (x0 free below)
    assert res.lv[1] == 0.0 and res.uv[1] == 10.0

    # two free variables in one row: nothing can be implied
    res2 = propagate_bounds(
        offsets, indices, values,
        np.array([-np.inf]), np.array([5.0]),
        np.array([-np.inf, -np.inf]), np.array([np.inf, np.inf]),
        np.array([False, False]),
    )
    assert not res2.infeasible
    assert not np.isfinite(res2.uv).any()
    assert not np.isfinite(res2.lv).any()


def test_real_mip_instances():
    """Reference MIP datasets end-to-end (reference miplib_test.cu
    solves these in CI): optimality on the small ones, a feasible
    incumbent with a rigorous bound on neos5."""
    import os

    import numpy as np
    import pytest as _pytest

    root = "/root/reference/datasets/mip"
    if not os.path.isdir(root):
        _pytest.skip("reference datasets not mounted")
    from cuopt_tpu import constants as C
    from cuopt_tpu.io import parse_mps
    from cuopt_tpu.lp.settings import MIPSolverSettings
    from cuopt_tpu.mip.solve import solve_mip

    p = parse_mps(os.path.join(root, "sample.mps"))
    s = MIPSolverSettings()
    s.time_limit = 30
    sol = solve_mip(p, s)
    assert sol.get_termination_status() == \
        C.CUOPT_TERIMINATION_STATUS_OPTIMAL
    assert abs(sol.get_primal_objective() + 28.0) < 1e-6

    p = parse_mps(os.path.join(root, "sudoku.mps"))
    s = MIPSolverSettings()
    s.time_limit = 60
    sol = solve_mip(p, s)
    assert sol.get_termination_status() == \
        C.CUOPT_TERIMINATION_STATUS_OPTIMAL

    # neos5 (free-bound variant): known optimum 15; within a short
    # budget we require a feasible incumbent, a VALID finite bound
    # bracket, genuine tree progress (nodes > 0 — the round-3 threaded
    # design starved to nodes=0), and the time budget respected (the
    # background-compiled heuristics must not stall the solve)
    import time as _time

    p = parse_mps(os.path.join(root, "neos5-free-bound.mps"))
    s = MIPSolverSettings()
    s.time_limit = 45
    t0 = _time.monotonic()
    sol = solve_mip(p, s)
    elapsed = _time.monotonic() - t0
    assert sol.get_termination_status() in (
        C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
        C.CUOPT_TERIMINATION_STATUS_FEASIBLE_FOUND,
    )
    obj = sol.get_primal_objective()
    bound = sol.get_solution_bound()
    assert obj >= 15.0 - 1e-6  # never better than the true optimum
    assert np.isfinite(bound)
    assert bound <= 15.0 + 1e-6  # bound must bracket the true optimum
    assert sol._raw.get("nodes", 0) > 0
    assert elapsed < 45 + 20  # limit + bounded slice overshoot
    x = sol.get_primal_solution()
    assert np.allclose(
        x[p.variable_types == "I"],
        np.round(x[p.variable_types == "I"]), atol=1e-5,
    )

