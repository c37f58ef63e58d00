"""Sparse operator tests: every operator kind must agree with the dense
matrix on matvec/rmatvec/rescale/reductions (role of the reference's
cusparse_view usage, cpp/src/linear_programming/cusparse_view.hpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cuopt_tpu.problem.synthetic import generate_lp
from cuopt_tpu.sparse import BlockBandOp, build_operator


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
