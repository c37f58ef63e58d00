"""Sparse operator tests: every operator kind must agree with the dense
matrix on matvec/rmatvec/rescale/reductions (role of the reference's
cusparse_view usage, cpp/src/linear_programming/cusparse_view.hpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cuopt_tpu.problem.synthetic import generate_lp
from cuopt_tpu.sparse import BlockBandOp, PermutedOp, build_operator


def _dense(prob, n, m):
    A = np.zeros((n, m))
    rows = np.repeat(np.arange(n), np.diff(prob.offsets))
    np.add.at(A, (rows, prob.indices), prob.values)
    return A


@pytest.mark.parametrize("kind", ["dense", "ell", "csr", "blockband"])
def test_operator_matches_dense(kind):
    n, m = 600, 500
    prob = generate_lp(n, m, 5, seed=11, band=160)
    A = _dense(prob, n, m)
    op = build_operator(
        prob.offsets, prob.indices, prob.values, n, m,
        dtype=jnp.float64, kind=kind,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=m)
    y = rng.normal(size=n)
    np.testing.assert_allclose(
        np.asarray(op.matvec(jnp.asarray(x))), A @ x, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(jnp.asarray(y))), A.T @ y, atol=1e-10
    )
    r = rng.uniform(0.5, 2.0, n)
    c = rng.uniform(0.5, 2.0, m)
    op2 = op.rescale(jnp.asarray(r), jnp.asarray(c))
    A2 = r[:, None] * A * c[None, :]
    np.testing.assert_allclose(
        np.asarray(op2.matvec(jnp.asarray(x))), A2 @ x, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(op.row_abs_max()), np.abs(A).max(axis=1), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op.col_abs_max()), np.abs(A).max(axis=0), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op.row_abs_reduce(1.5)),
        (np.abs(A) ** 1.5).sum(axis=1), atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(op.col_abs_reduce(0.5)),
        (np.abs(A) ** 0.5).sum(axis=0), atol=1e-9,
    )
    assert abs(float(op.abs_max()) - np.abs(A).max()) < 1e-12


def test_auto_prefers_blockband_for_banded():
    prob = generate_lp(4000, 4000, 6, seed=2, band=192)
    op = build_operator(
        prob.offsets, prob.indices, prob.values, 4000, 4000,
        dtype=jnp.float32, kind="auto", dense_size_limit=1 << 10,
    )
    assert isinstance(op, BlockBandOp)


def test_blockband_rejects_unstructured():
    prob = generate_lp(4000, 4000, 6, seed=2)  # uniform random columns
    with pytest.raises(ValueError):
        build_operator(
            prob.offsets, prob.indices, prob.values, 4000, 4000,
            dtype=jnp.float32, kind="blockband",
        )


def _shuffled_banded(n, m, seed=7, band=160, nnz_per_row=6):
    """A banded LP whose rows/cols are randomly shuffled — unstructured to
    the eye, bandable after reordering (the general-pattern case the
    reference handles via cusparse CSR, cusparse_view.hpp:30)."""
    from cuopt_tpu.sparse.reorder import permute_csr

    prob = generate_lp(n, m, nnz_per_row, seed=seed, band=band)
    rng = np.random.default_rng(seed + 1)
    rp, cp = rng.permutation(n), rng.permutation(m)
    offs, idx, vals = permute_csr(
        np.asarray(prob.offsets), np.asarray(prob.indices),
        np.asarray(prob.values, np.float64), rp, cp, n, m,
    )
    return offs, idx, vals


def test_spill_handles_outlier_dense_rows():
    """A banded matrix plus scattered dense coupling rows must still get
    the slab operator, with the outliers carried by the CSR spill."""
    n = m = 4000
    prob = generate_lp(n, m, 6, seed=3, band=192)
    offs = np.asarray(prob.offsets)
    idx = np.asarray(prob.indices)
    vals = np.asarray(prob.values, np.float64)
    rng = np.random.default_rng(0)
    # prepend 300 scattered entries onto row 0 (a dense coupling row)
    extra_cols = rng.choice(m, 300, replace=False)
    idx = np.concatenate([extra_cols, idx[offs[1]:]])
    vals = np.concatenate([rng.normal(size=300), vals[offs[1]:]])
    offs = offs.copy()
    offs[1:] = offs[1:] - (offs[1] - offs[0]) + 300
    A = np.zeros((n, m))
    rows = np.repeat(np.arange(n), np.diff(offs))
    np.add.at(A, (rows, idx), vals)

    op = build_operator(offs, idx, vals, n, m, dtype=jnp.float64,
                        kind="blockband")
    assert isinstance(op, BlockBandOp)
    assert op.w_row < m  # the dense row did NOT blow up the window
    assert op.spill_vals.shape[0] > 0
    x = np.random.default_rng(1).normal(size=m)
    y = np.random.default_rng(2).normal(size=n)
    np.testing.assert_allclose(
        np.asarray(op.matvec(jnp.asarray(x))), A @ x, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(jnp.asarray(y))), A.T @ y, atol=1e-9)
    r = np.random.default_rng(3).uniform(0.5, 2.0, n)
    c = np.random.default_rng(4).uniform(0.5, 2.0, m)
    op2 = op.rescale(jnp.asarray(r), jnp.asarray(c))
    A2 = r[:, None] * A * c[None, :]
    np.testing.assert_allclose(
        np.asarray(op2.matvec(jnp.asarray(x))), A2 @ x, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(op.row_abs_reduce(1.0)), np.abs(A).sum(axis=1),
        atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(op.col_abs_max()), np.abs(A).max(axis=0), atol=1e-12)


def test_auto_reorders_shuffled_banded_to_permuted_band():
    n = m = 3000
    offs, idx, vals = _shuffled_banded(n, m)
    A = np.zeros((n, m))
    rows = np.repeat(np.arange(n), np.diff(offs))
    np.add.at(A, (rows, idx), vals)
    op = build_operator(offs, idx, vals, n, m, dtype=jnp.float64,
                        kind="auto", dense_size_limit=1 << 10)
    assert isinstance(op, PermutedOp)
    rng = np.random.default_rng(0)
    x, y = rng.normal(size=m), rng.normal(size=n)
    np.testing.assert_allclose(
        np.asarray(op.matvec(jnp.asarray(x))), A @ x, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(jnp.asarray(y))), A.T @ y, atol=1e-9)
    r = rng.uniform(0.5, 2.0, n)
    c = rng.uniform(0.5, 2.0, m)
    op2 = op.rescale(jnp.asarray(r), jnp.asarray(c))
    A2 = r[:, None] * A * c[None, :]
    np.testing.assert_allclose(
        np.asarray(op2.matvec(jnp.asarray(x))), A2 @ x, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(op.row_abs_max()), np.abs(A).max(axis=1), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(op.col_abs_reduce(1.0)), np.abs(A).sum(axis=0),
        atol=1e-9)


def test_lp_solves_with_permuted_band_operator():
    """End-to-end PDLP through the PermutedOp fast path vs CSR."""
    from cuopt_tpu import constants as C
    from cuopt_tpu.lp.pdlp import PdlpSolver
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.problem.data_model import OptimizationProblem

    n = m = 1200
    offs, idx, vals = _shuffled_banded(n, m, seed=9, band=160)
    rng = np.random.default_rng(5)
    prob = OptimizationProblem(
        offsets=offs, indices=idx, values=vals,
        objective_coefficients=rng.uniform(0.5, 1.5, m),
        constraint_lower_bounds=np.full(n, -np.inf),
        constraint_upper_bounds=rng.uniform(1.0, 3.0, n),
        variable_lower_bounds=np.zeros(m),
        variable_upper_bounds=np.full(m, 10.0),
        maximize=True,
    )

    def _solve(kind):
        s = PDLPSolverSettings()
        s.method = C.CUOPT_METHOD_PDLP
        s.operator_kind = kind
        s.log_to_console = False
        return PdlpSolver(prob, s).run()

    raw = _solve("bandperm")
    raw2 = _solve("csr")
    assert raw["status"] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL
    assert abs(raw["primal_objective"] - raw2["primal_objective"]) < 1e-2 \
        * max(1.0, abs(raw2["primal_objective"]))


def test_lp_solves_with_blockband_operator():
    """End-to-end PDLP on a banded LP with the MXU operator."""
    from cuopt_tpu import constants as C
    from cuopt_tpu.lp.pdlp import PdlpSolver
    from cuopt_tpu.lp.settings import PDLPSolverSettings

    prob = generate_lp(1500, 1500, 6, seed=5, band=160)
    s = PDLPSolverSettings()
    s.method = C.CUOPT_METHOD_PDLP
    s.operator_kind = "blockband"
    s.log_to_console = False
    raw = PdlpSolver(prob, s).run()
    assert raw["status"] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL
    # cross-check against the csr operator
    s2 = PDLPSolverSettings()
    s2.method = C.CUOPT_METHOD_PDLP
    s2.operator_kind = "csr"
    s2.log_to_console = False
    raw2 = PdlpSolver(prob, s2).run()
    assert abs(raw["primal_objective"] - raw2["primal_objective"]) < 1e-2 \
        * max(1.0, abs(raw2["primal_objective"]))
