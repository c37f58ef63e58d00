"""Golden termination statuses + objectives over the full reference LP
dataset (reference pdlp_test.cu:68-160 gates the same files on status +
objective). Infeasible/unbounded fixtures verified by hand:
good-mps-fixed-var forces VAR2 <= -0.15 < 0; the ranges fixtures'
equality pair forces (8.33, -7.33) violating ROW3; the free-var
fixtures are unbounded below through the free variable."""

import os

import numpy as np
import pytest

ROOT = "/root/reference/datasets/linear_programming"

GOLDEN = {
    # instance: (status, objective or None)
    "afiro_original.mps": (1, -464.7531),
    "empty_matrix.mps": (1, -6.0),
    "free-format-mps-1.mps": (1, 0.0),
    "good-fixed-mps-2.mps": (1, 0.0),
    "good-max.mps": (1, 17.0),
    "good-mps-1.mps": (1, 0.0),
    "good-mps-fixed-ranges.mps": (2, None),
    "good-mps-fixed-var.mps": (2, None),
    "good-mps-free-ranges.mps": (2, None),
    "good-mps-free-var.mps": (3, None),
    "good-mps-lower-bound-inf-var.mps": (3, None),
    "good-mps-rhs-cost.mps": (1, -5.0),
    "good-mps-some-var-bounds.mps": (1, -0.2),
    "good-mps-upper-bound-inf-var.mps": (1, 0.0),
    "lp_model_with_var_bounds.mps": (1, -2.0),
    "max_offset.mps": (1, 0.0),
}


@pytest.mark.skipif(not os.path.isdir(ROOT),
                    reason="reference datasets not mounted")
@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_lp_dataset_golden(name):
    from cuopt_tpu.io import parse_mps
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.lp.solve import solve_lp

    status_exp, obj_exp = GOLDEN[name]
    p = parse_mps(os.path.join(ROOT, name))
    s = PDLPSolverSettings()
    s.time_limit = 60
    sol = solve_lp(p, s)
    assert sol.get_termination_status() == status_exp, name
    if obj_exp is not None:
        assert abs(sol.get_primal_objective() - obj_exp) <= 1e-3 * (
            1 + abs(obj_exp)), name
