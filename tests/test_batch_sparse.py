"""Sparse batch LP: same-shape problems too large for the stacked-dense
operator must still batch (reference batches arbitrary LPs per stream,
cython_solve.cu:264-290). Two regimes:

  - identical sparsity pattern (the B&B node-relaxation case) ->
    stacked BlockBandOp;
  - different patterns -> common-width stacked ELL.
"""

import dataclasses

import numpy as np
import pytest

from cuopt_tpu import constants as C
from cuopt_tpu.lp.batch import _pick_batch_kind, batch_solve
from cuopt_tpu.lp.settings import PDLPSolverSettings
from cuopt_tpu.lp.solve import solve_lp
from cuopt_tpu.problem.synthetic import generate_lp


def _settings():
    s = PDLPSolverSettings()
    s.set_optimality_tolerance(1e-4)
    s.iteration_limit = 20_000
    return s


def test_same_pattern_batches_blockband():
    # 2500x2500 > dense limit (2^21 elements); same pattern, varied
    # bounds/objective
    base = generate_lp(2500, 2500, 6, seed=3, band=96)
    probs = []
    rng = np.random.default_rng(0)
    for k in range(4):
        p = dataclasses.replace(
            base,
            objective_coefficients=base.objective_coefficients
            * (1.0 + 0.1 * k),
            constraint_upper_bounds=base.constraint_upper_bounds
            + rng.uniform(0, 0.5, base.n_constraints),
        )
        probs.append(p)
    assert _pick_batch_kind(probs) == "blockband"
    sols = batch_solve(probs, _settings())
    for p, sol in zip(probs, sols):
        info = sol.raw if hasattr(sol, "raw") else sol.__dict__
        raw = getattr(sol, "_raw", None) or info.get("raw") or info
        assert sol.get_termination_status() in (
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
            C.CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT,
        )
    # at least verify the batched status objective matches sequential
    ref = solve_lp(probs[0], _settings())
    if sols[0].get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL and \
            ref.get_termination_status() == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL:
        assert abs(sols[0].get_primal_objective()
                   - ref.get_primal_objective()) <= 1e-2 * (
            1 + abs(ref.get_primal_objective()))


def test_mixed_pattern_batches_ell():
    probs = [generate_lp(2048, 2048, 5, seed=s, band=128)
             for s in (11, 12, 13)]
    assert _pick_batch_kind(probs) == "ell"
    sols = batch_solve(probs, _settings())
    for p, sol in zip(probs, sols):
        assert sol.get_termination_status() in (
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
            C.CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT,
        )
        if sol.get_termination_status() == \
                C.CUOPT_TERIMINATION_STATUS_OPTIMAL:
            ref = solve_lp(p, _settings())
            assert abs(sol.get_primal_objective()
                       - ref.get_primal_objective()) <= 1e-2 * (
                1 + abs(ref.get_primal_objective()))
