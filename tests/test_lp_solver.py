"""LP solver tests.

Mirrors the reference test strategy (cpp/tests/linear_programming/
pdlp_test.cu:68-160: solve real MPS files, assert termination status +
objective within 1%; initial-solution / iteration-limit / time-limit
variants; python/cuopt tests test_lp_solver.py).
"""

import numpy as np
import pytest

from cuopt_tpu import constants as C
from cuopt_tpu.io import parse_mps
from cuopt_tpu.linear_programming import (
    DataModel,
    PDLPSolverSettings,
    Solve,
    SolverSettings,
)

AFIRO_OBJECTIVE = -464.753  # reference pdlp_test.cu:58 uses -464 (1% tol)


def is_correct_objective(reference, objective, tol=0.01):
    # reference pdlp_test.cu:61-66
    if reference == 0:
        return abs(objective) <= 0.01
    if objective == 0:
        return abs(reference) <= 0.01
    return abs((reference - objective) / reference) <= tol


def pdlp_settings(**kw):
    s = PDLPSolverSettings()
    s.method = C.CUOPT_METHOD_PDLP
    for k, v in kw.items():
        setattr(s, k, v)
    return s


class TestAfiro:
    def test_solve_afiro(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        sol = Solve(p, pdlp_settings())
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        assert is_correct_objective(
            AFIRO_OBJECTIVE, sol.get_primal_objective()
        )

    def test_iteration_limit(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        sol = Solve(p, pdlp_settings(iteration_limit=40))
        assert sol.get_termination_status() in (
            C.CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT,
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
        )
        assert sol.get_nb_iterations() <= 80  # one major chunk overshoot max

    def test_time_limit(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        sol = Solve(p, pdlp_settings(time_limit=1e-9, iteration_limit=10**9))
        assert sol.get_termination_status() in (
            C.CUOPT_TERIMINATION_STATUS_TIME_LIMIT,
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL,  # tiny problems may finish
        )

    def test_initial_solution(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        base = Solve(p, pdlp_settings())
        s = pdlp_settings()
        s.initial_primal_solution = base.get_primal_solution()
        s.initial_dual_solution = base.get_dual_solution()
        sol = Solve(p, s)
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        # warm-started solve should converge at least as fast
        assert sol.get_nb_iterations() <= base.get_nb_iterations()

    @pytest.mark.parametrize("mode", [0, 1, 2, 3])
    def test_solver_modes(self, lp_datasets, mode):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        sol = Solve(p, pdlp_settings(pdlp_solver_mode=mode))
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        assert is_correct_objective(
            AFIRO_OBJECTIVE, sol.get_primal_objective()
        )

    def test_float32(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        sol = Solve(p, pdlp_settings(dtype="float32"))
        assert is_correct_objective(
            AFIRO_OBJECTIVE, sol.get_primal_objective(), tol=0.02
        )


class TestSmallLps:
    def test_good_mps_1(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "good-mps-1.mps"))
        sol = Solve(p, pdlp_settings())
        # min 0.2x+0.1y, x,y>=0, rows <= : optimum at origin
        assert is_correct_objective(0.0, sol.get_primal_objective())

    def test_good_max(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "good-max.mps"))
        sol = Solve(p, pdlp_settings())
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        assert is_correct_objective(17.0, sol.get_primal_objective())

    def test_ranged_rows_feasible(self):
        # ranged constraint 1 <= x + y <= 3 with min x + 2y, x,y in [0, 5]
        dm = DataModel()
        dm.set_csr_constraint_matrix([1.0, 1.0], [0, 1], [0, 2])
        dm.set_objective_coefficients([1.0, 2.0])
        dm.set_constraint_lower_bounds([1.0])
        dm.set_constraint_upper_bounds([3.0])
        dm.set_variable_lower_bounds([0.0, 0.0])
        dm.set_variable_upper_bounds([5.0, 5.0])
        sol = Solve(dm, pdlp_settings())
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        assert is_correct_objective(1.0, sol.get_primal_objective())
        x = sol.get_primal_solution()
        assert 1.0 - 1e-3 <= x.sum() <= 3.0 + 1e-3

    def test_infeasible_detected(self, lp_datasets):
        # good-mps-fixed-ranges parses fine but its equality rows force a
        # negative variable against the default x >= 0 bound -> infeasible
        p = parse_mps(str(lp_datasets / "good-mps-fixed-ranges.mps"))
        s = pdlp_settings(detect_infeasibility=True, iteration_limit=20000)
        sol = Solve(p, s)
        assert sol.get_termination_status() in (
            C.CUOPT_TERIMINATION_STATUS_INFEASIBLE,
            C.CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT,
        )

    def test_simple_infeasible(self):
        # x >= 2 and x <= 1 simultaneously
        dm = DataModel()
        dm.set_csr_constraint_matrix([1.0, 1.0], [0, 0], [0, 1, 2])
        dm.set_objective_coefficients([1.0])
        dm.set_row_types("GL")
        dm.set_constraint_bounds([2.0, 1.0])
        s = pdlp_settings(detect_infeasibility=True, iteration_limit=20000)
        sol = Solve(dm, s)
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_INFEASIBLE

    def test_empty_matrix(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "empty_matrix.mps"))
        sol = Solve(p, pdlp_settings())
        assert sol.get_termination_status() in (
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
            C.CUOPT_TERIMINATION_STATUS_UNBOUNDED,
        )

    def test_datamodel_roundtrip(self):
        # min -x1 - 2 x2  s.t. x1 + x2 <= 4, x1 <= 3, x2 <= 2 -> obj -7
        dm = DataModel()
        dm.set_csr_constraint_matrix(
            [1.0, 1.0], [0, 1], [0, 2]
        )
        dm.set_objective_coefficients([-1.0, -2.0])
        dm.set_row_types("L")
        dm.set_constraint_bounds([4.0])
        dm.set_variable_lower_bounds([0.0, 0.0])
        dm.set_variable_upper_bounds([3.0, 2.0])
        sol = Solve(dm, pdlp_settings())
        assert is_correct_objective(-6.0, sol.get_primal_objective())

    def test_equality_problem(self):
        # x + y = 3, x - y = 1 -> x=2,y=1; min x+y = 3
        dm = DataModel()
        dm.set_csr_constraint_matrix(
            [1.0, 1.0, 1.0, -1.0], [0, 1, 0, 1], [0, 2, 4]
        )
        dm.set_objective_coefficients([1.0, 1.0])
        dm.set_row_types("EE")
        dm.set_constraint_bounds([3.0, 1.0])
        dm.set_variable_lower_bounds([-10.0, -10.0])
        dm.set_variable_upper_bounds([10.0, 10.0])
        sol = Solve(dm, pdlp_settings())
        assert is_correct_objective(3.0, sol.get_primal_objective())
        np.testing.assert_allclose(
            sol.get_primal_solution(), [2.0, 1.0], atol=1e-2
        )

    def test_unbounded_detected(self, lp_datasets):
        # good-mps-free-var: v1 free with positive cost and only <= rows:
        # v1 -> -inf drives the objective to -inf (dual infeasible)
        p = parse_mps(str(lp_datasets / "good-mps-free-var.mps"))
        s = pdlp_settings(detect_infeasibility=True, iteration_limit=20000)
        sol = Solve(p, s)
        assert sol.get_termination_status() in (
            C.CUOPT_TERIMINATION_STATUS_UNBOUNDED,
            C.CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT,
            C.CUOPT_TERIMINATION_STATUS_NUMERICAL_ERROR,
        )
        assert sol.get_termination_status() != \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL


class TestOperators:
    @pytest.mark.parametrize("kind", ["dense", "ell", "csr"])
    def test_operator_kinds_agree(self, lp_datasets, kind):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        sol = Solve(p, pdlp_settings(operator_kind=kind))
        assert is_correct_objective(
            AFIRO_OBJECTIVE, sol.get_primal_objective()
        )


class TestSolutionObject:
    def test_sol_file(self, lp_datasets, tmp_path):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        sol = Solve(p, pdlp_settings())
        f = tmp_path / "afiro.sol"
        sol.write_to_sol_file(str(f))
        text = f.read_text()
        assert "Objective value" in text
        assert "X01" in text or "x01" in text.lower()

    def test_get_vars(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        sol = Solve(p, pdlp_settings())
        v = sol.get_vars()
        assert len(v) == 32

    def test_dual_solution_reduced_costs(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        sol = Solve(p, pdlp_settings())
        assert sol.get_dual_solution().shape == (27,)
        assert sol.get_reduced_costs().shape == (32,)


class TestSettingsRegistry:
    def test_set_get_parameters(self):
        s = SolverSettings()
        s.set_parameter(C.CUOPT_ABSOLUTE_PRIMAL_TOLERANCE, 1e-6)
        assert s.get_parameter(C.CUOPT_ABSOLUTE_PRIMAL_TOLERANCE) == 1e-6
        s.set_parameter(C.CUOPT_ITERATION_LIMIT, 1000)
        assert s.pdlp.iteration_limit == 1000
        s.set_parameter(C.CUOPT_METHOD, C.CUOPT_METHOD_PDLP)
        assert s.pdlp.method == C.CUOPT_METHOD_PDLP
        s.set_parameter(C.CUOPT_CROSSOVER, "true")
        assert s.pdlp.crossover is True

    def test_unknown_parameter(self):
        from cuopt_tpu.utils.errors import ValidationError

        s = SolverSettings()
        with pytest.raises(ValidationError):
            s.set_parameter("not_a_parameter", 1)

    def test_parameter_names_cover_reference(self):
        s = SolverSettings()
        names = s.parameter_names()
        for expected in (
            "time_limit", "iteration_limit", "pdlp_solver_mode", "method",
            "absolute_primal_tolerance", "crossover",
            "mip_relative_gap", "num_cpu_threads",
        ):
            assert expected in names

    def test_optimality_tolerance_helper(self):
        s = SolverSettings()
        s.set_optimality_tolerance(1e-6)
        assert s.pdlp.tolerances.relative_gap_tolerance == 1e-6


class TestWarmStart:
    """PDLP warm-start data export/import (reference
    pdlp_warm_start_data.hpp; pdlp.cu:470-488)."""

    def test_warm_start_roundtrip(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        # cold partial solve
        s1 = pdlp_settings(iteration_limit=40, log_to_console=False)
        sol1 = Solve(p, s1)
        ws = sol1.get_pdlp_warm_start_data()
        assert ws is not None
        assert ws.total_pdlp_iterations >= 1
        # resume from the warm start: must reach optimality and keep
        # counting iterations from where it stopped
        s2 = pdlp_settings(log_to_console=False)
        s2.set_pdlp_warm_start_data(ws)
        sol2 = Solve(p, s2)
        assert sol2.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        assert is_correct_objective(
            AFIRO_OBJECTIVE, sol2.get_primal_objective()
        )
        assert sol2.get_nb_iterations() > ws.total_pdlp_iterations

    def test_warm_start_dict_roundtrip(self, lp_datasets):
        from cuopt_tpu.lp.warm_start import PdlpWarmStartData

        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        s1 = pdlp_settings(iteration_limit=40, log_to_console=False)
        ws = Solve(p, s1).get_pdlp_warm_start_data()
        d = ws.to_dict()
        ws2 = PdlpWarmStartData.from_dict(d)
        np.testing.assert_allclose(
            ws.current_primal_solution, ws2.current_primal_solution
        )
        assert ws2.initial_step_size == ws.initial_step_size


class TestPrimalModes:
    def test_save_best_primal_so_far(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        s = pdlp_settings(save_best_primal_so_far=True,
                          log_to_console=False)
        sol = Solve(p, s)
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL

    def test_first_primal_feasible_stops_early(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        s = pdlp_settings(first_primal_feasible=True,
                          log_to_console=False)
        sol = Solve(p, s)
        assert sol.get_termination_status() in (
            C.CUOPT_TERIMINATION_STATUS_PRIMAL_FEASIBLE,
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
        )

    def test_per_constraint_residual_mode(self, lp_datasets):
        p = parse_mps(str(lp_datasets / "afiro_original.mps"))
        s = pdlp_settings(per_constraint_residual=True,
                          log_to_console=False)
        sol = Solve(p, s)
        assert sol.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        # every constraint individually within tolerance
        x = sol.get_primal_solution()
        act = p.to_dense() @ x
        lo, hi = p.constraint_lower_bounds, p.constraint_upper_bounds
        vio = np.maximum(
            np.where(np.isfinite(lo), lo - act, 0.0),
            np.where(np.isfinite(hi), act - hi, 0.0),
        )
        lim = 1e-4 + 1e-4 * np.maximum(
            np.abs(np.where(np.isfinite(lo), lo, 0.0)),
            np.abs(np.where(np.isfinite(hi), hi, 0.0)),
        )
        assert np.all(vio <= lim + 1e-12)


def test_methodical1_trust_region_restart_solves_afiro():
    """METHODICAL1 preset exercises the trust-region (localized duality
    gap) restart path (reference restart_strategy TRUST_REGION_RESTART)."""
    from cuopt_tpu import constants as C
    from cuopt_tpu.io import parse_mps
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.lp.pdlp import PdlpSolver

    prob = parse_mps(
        "/root/reference/datasets/linear_programming/afiro_original.mps"
    )
    settings = PDLPSolverSettings()
    settings.pdlp_solver_mode = C.CUOPT_PDLP_SOLVER_MODE_METHODICAL1
    settings.iteration_limit = 50_000
    sol = PdlpSolver(prob, settings).run()
    assert sol["status"] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL
    assert abs(sol["primal_objective"] - (-464.7531)) < 1e-1


class TestBatchSolve:
    def test_vmapped_batch_matches_sequential(self):
        """Same-shape LPs run through ONE vmapped PDLP program and agree
        with per-problem solves (reference cython_solve.cu:264-290)."""
        from cuopt_tpu.lp.batch import batch_solve
        from cuopt_tpu.lp.solve import solve_lp
        from cuopt_tpu.problem.synthetic import generate_lp

        probs = [generate_lp(120, 150, 5, seed=s) for s in range(5)]
        # one different shape -> exercises the sequential fallback path
        probs.append(generate_lp(80, 90, 4, seed=99))
        s = PDLPSolverSettings()
        s.log_to_console = False
        sols = batch_solve(probs, s)
        assert len(sols) == 6
        for p, sol in zip(probs, sols):
            ref = solve_lp(p, s)
            assert abs(sol.get_primal_objective()
                       - ref.get_primal_objective()) < 1e-2 * max(
                1.0, abs(ref.get_primal_objective()))
        info = sols[0].get_additional_termination_information()
        assert info.get("solved_by") == "pdlp_batch"
        info5 = sols[5].get_additional_termination_information()
        assert info5.get("solved_by") != "pdlp_batch"
