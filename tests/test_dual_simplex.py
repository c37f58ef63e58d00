"""Native dual simplex + concurrent + crossover tests.

Mirrors reference cpp/tests/dual_simplex/unit_tests/solve.cpp (direct LP
solves) and the concurrent-mode behavior of solve.cu:467-537.
"""

import numpy as np
import pytest

from cuopt_tpu import constants as C
from cuopt_tpu.io import parse_mps
from cuopt_tpu.linear_programming import PDLPSolverSettings, Solve
from cuopt_tpu.lp.settings import PDLPSolverSettings as Settings
from cuopt_tpu.utils.timer import Timer

AFIRO = "/root/reference/datasets/linear_programming/afiro_original.mps"


@pytest.fixture(scope="module")
def native_available():
    from cuopt_tpu.dual_simplex import is_available

    if not is_available():
        pytest.skip("native simplex library not built")
    return True


class TestNativeSimplex:
    def test_afiro_exact(self, native_available):
        from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

        p = parse_mps(AFIRO)
        raw = solve_lp_simplex(p, Settings(), Timer(60))
        assert raw["status"] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        # exact vertex optimum, not a 1e-4 approximation
        assert abs(raw["primal_objective"] - (-464.7531428571428)) < 1e-6

    def test_maximize(self, native_available):
        from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

        p = parse_mps(
            "/root/reference/datasets/linear_programming/good-max.mps"
        )
        raw = solve_lp_simplex(p, Settings(), Timer(60))
        assert raw["status"] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        assert abs(raw["primal_objective"] - 17.0) < 1e-6

    def test_infeasible(self, native_available):
        from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

        p = parse_mps(
            "/root/reference/datasets/linear_programming/"
            "good-mps-fixed-ranges.mps"
        )
        raw = solve_lp_simplex(p, Settings(), Timer(60))
        assert raw["status"] == C.CUOPT_TERIMINATION_STATUS_INFEASIBLE

    def test_unbounded(self, native_available):
        from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

        p = parse_mps(
            "/root/reference/datasets/linear_programming/"
            "good-mps-free-var.mps"
        )
        raw = solve_lp_simplex(p, Settings(), Timer(60))
        assert raw["status"] == C.CUOPT_TERIMINATION_STATUS_UNBOUNDED

    def test_dual_solution_certificate(self, native_available):
        """Strong duality at a vertex: c^T x == b-ish^T y with bounds."""
        from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

        p = parse_mps(AFIRO)
        raw = solve_lp_simplex(p, Settings(), Timer(60))
        x = raw["primal_solution"]
        A = p.to_dense()
        act = A @ x
        assert np.all(act <= p.constraint_upper_bounds + 1e-6)
        assert np.all(act >= p.constraint_lower_bounds - 1e-6)
        assert np.all(x >= p.variable_lower_bounds - 1e-6)
        assert np.all(x <= p.variable_upper_bounds + 1e-6)


class TestMethods:
    def test_dual_simplex_method(self, native_available):
        p = parse_mps(AFIRO)
        s = PDLPSolverSettings()
        s.method = C.CUOPT_METHOD_DUAL_SIMPLEX
        sol = Solve(p, s)
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        assert abs(sol.get_primal_objective() + 464.7531) < 1e-3

    def test_concurrent_method(self, native_available):
        p = parse_mps(AFIRO)
        s = PDLPSolverSettings()
        s.method = C.CUOPT_METHOD_CONCURRENT
        sol = Solve(p, s)
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        info = sol.get_additional_termination_information()
        assert info.get("solved_by") in ("dual_simplex", "pdlp",
                                         "pdlp+crossover", None)

    def test_crossover(self, native_available):
        p = parse_mps(AFIRO)
        s = PDLPSolverSettings()
        s.method = C.CUOPT_METHOD_CONCURRENT
        s.crossover = True
        sol = Solve(p, s)
        assert abs(sol.get_primal_objective() + 464.7531) < 1e-2
