"""Mittelmann-structure generator gates (reference benchmarks on the
real Mittelmann LPfeasible set, get_datasets.py:32-81 — a network
download; these generators reproduce its structural classes offline).

Gate: on shrunken copies, PDLP at 1e-6 must agree with the native dual
simplex objective on every family (VERDICT r04 missing #3 / next #8).
"""

import numpy as np
import pytest

from cuopt_tpu import constants as C
from cuopt_tpu.problem.mittelmann import GENERATORS


@pytest.mark.parametrize("name", sorted(GENERATORS))
def test_pdlp_matches_simplex_on_shrunken_copy(name):
    from cuopt_tpu.dual_simplex import is_available
    from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex
    from cuopt_tpu.lp.pdlp import PdlpSolver
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.utils.timer import Timer

    if not is_available():
        pytest.skip("native simplex unavailable")
    prob = GENERATORS[name](800, 3)
    prob.validate()
    s = PDLPSolverSettings()
    s.time_limit = 120
    ds = solve_lp_simplex(prob, s, Timer(120))
    assert ds["status"] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL, name

    s2 = PDLPSolverSettings()
    s2.time_limit = 300
    s2.set_optimality_tolerance(1e-6)
    s2.iteration_limit = 200_000
    lp = PdlpSolver(prob, s2).run()
    assert lp["status"] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL, name
    a, b = ds["primal_objective"], lp["primal_objective"]
    assert abs(a - b) <= 1e-4 * max(1.0, abs(a)), (name, a, b)


def test_generators_are_deterministic():
    for name, gen in GENERATORS.items():
        p1 = gen(500, 7)
        p2 = gen(500, 7)
        assert p1.nnz == p2.nnz
        np.testing.assert_array_equal(p1.values, p2.values)
