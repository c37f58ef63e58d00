"""CLI and C-API tests, mirroring reference c_api_tests/c_api_test.c and
cuopt_cli usage."""

import subprocess
import sys

import numpy as np

from cuopt_tpu import constants as C

AFIRO = "/root/reference/datasets/linear_programming/afiro_original.mps"


class TestCli:
    def test_solve_afiro(self):
        r = subprocess.run(
            [sys.executable, "-m", "cuopt_tpu.cli", AFIRO,
             "--method", "1", "--log_to_console", "false"],
            capture_output=True, text=True, timeout=400,
        )
        assert r.returncode == 0, r.stderr
        assert "Optimal" in r.stdout
        assert "-464" in r.stdout

    def test_missing_file(self):
        r = subprocess.run(
            [sys.executable, "-m", "cuopt_tpu.cli", "/tmp/nope.mps"],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == C.CUOPT_MPS_FILE_ERROR

    def test_unknown_flag(self):
        r = subprocess.run(
            [sys.executable, "-m", "cuopt_tpu.cli", AFIRO, "--not-a-flag"],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode != 0


class TestCApi:
    def test_read_and_solve(self):
        from cuopt_tpu import c_api as capi

        prob = []
        assert capi.cuOptReadProblem(AFIRO, prob) == C.CUOPT_SUCCESS
        n = []
        capi.cuOptGetNumConstraints(prob, n)
        assert n[0] == 27
        m = []
        capi.cuOptGetNumVariables(prob, m)
        assert m[0] == 32
        is_mip = []
        capi.cuOptIsMIP(prob, is_mip)
        assert is_mip[0] == 0

        settings = []
        assert capi.cuOptCreateSolverSettings(settings) == C.CUOPT_SUCCESS
        assert capi.cuOptSetParameter(
            settings, C.CUOPT_METHOD, C.CUOPT_METHOD_PDLP
        ) == C.CUOPT_SUCCESS
        assert capi.cuOptSetParameter(
            settings, "bogus_parameter", 1
        ) == C.CUOPT_INVALID_ARGUMENT

        solution = []
        assert capi.cuOptSolve(prob, settings, solution) == C.CUOPT_SUCCESS
        status = []
        capi.cuOptGetTerminationStatus(solution, status)
        assert status[0] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL
        obj = []
        capi.cuOptGetObjectiveValue(solution, obj)
        assert abs(obj[0] - (-464.753)) / 464.753 < 0.01
        x = []
        capi.cuOptGetPrimalSolution(solution, x)
        assert len(x[0]) == 32
        duals = []
        capi.cuOptGetDualSolution(solution, duals)
        assert len(duals[0]) == 27
        assert capi.cuOptDestroySolution(solution) == C.CUOPT_SUCCESS
        assert capi.cuOptDestroyProblem(prob) == C.CUOPT_SUCCESS

    def test_create_problem(self):
        from cuopt_tpu import c_api as capi

        prob = []
        status = capi.cuOptCreateProblem(
            2, 2, C.CUOPT_MINIMIZE, 0.0,
            [0.2, 0.1],
            [0, 2, 4], [0, 1, 0, 1], [3.0, 4.0, 2.7, 10.1],
            ["L", "L"], [5.4, 4.9],
            None, None, None, prob,
        )
        assert status == C.CUOPT_SUCCESS
        nnz = []
        capi.cuOptGetNumNonZeros(prob, nnz)
        assert nnz[0] == 4

    def test_read_bad_file(self):
        from cuopt_tpu import c_api as capi

        out = []
        assert capi.cuOptReadProblem(
            "/tmp/definitely-missing.mps", out
        ) == C.CUOPT_MPS_FILE_ERROR

    def test_error_strings(self):
        from cuopt_tpu import c_api as capi

        assert capi.cuOptGetErrorString(C.CUOPT_SUCCESS) == "Success"
        assert "Invalid" in capi.cuOptGetErrorString(
            C.CUOPT_INVALID_ARGUMENT
        )
