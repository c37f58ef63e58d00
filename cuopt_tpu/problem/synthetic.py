"""Synthetic LP instance generator.

Used by benchmarks and the multichip dryrun (the reference ships a synthetic
routing generator, cpp/src/routing/generator/, and pulls LP instances from
the network; offline we synthesize feasible LPs with known structure).

Generates a random sparse LP with a known feasible point:
    min c^T x   s.t.   A x <= b,  0 <= x <= u
where b = A x0 + slack for a random interior x0, guaranteeing feasibility
and boundedness (c >= 0 component mix with bounded x).
"""

from __future__ import annotations

import numpy as np

from cuopt_tpu.problem.data_model import OptimizationProblem


def generate_lp(
    n_rows: int,
    n_cols: int,
    nnz_per_row: int = 8,
    seed: int = 0,
    equality_fraction: float = 0.0,
    band: int | None = None,
) -> OptimizationProblem:
    """band=None: uniform random columns. band=W: staircase structure —
    row i's columns drawn from a width-W window around its proportional
    position (the dominant sparsity pattern of real LP families:
    multiperiod/multicommodity/staircase models in the Mittelmann set),
    which maps onto the MXU-friendly BlockBandOp."""
    rng = np.random.default_rng(seed)
    cols = np.empty((n_rows, nnz_per_row), np.int64)
    if band is None:
        if n_rows <= 100_000 and nnz_per_row <= n_cols:
            for i in range(n_rows):
                cols[i] = rng.choice(n_cols, size=nnz_per_row,
                                     replace=False)
        else:
            cols[:] = rng.integers(0, n_cols, (n_rows, nnz_per_row))
    else:
        W = max(band, nnz_per_row)
        Wc = min(W, n_cols)
        centers = (np.arange(n_rows) * n_cols) // max(n_rows, 1)
        starts = np.clip(centers - W // 2, 0, max(n_cols - W, 0))
        # vectorized distinct draws per row (chunked argpartition over
        # a random key matrix; the per-row rng.choice loop took minutes
        # at 1M rows)
        chunk = max(1, min(n_rows, (1 << 24) // max(Wc, 1)))
        for a in range(0, n_rows, chunk):
            b = min(a + chunk, n_rows)
            keys = rng.random((b - a, Wc))
            pick = np.argpartition(
                keys, nnz_per_row - 1, axis=1
            )[:, :nnz_per_row]
            cols[a:b] = starts[a:b, None] + pick
    vals = rng.standard_normal((n_rows, nnz_per_row))
    offsets = np.arange(n_rows + 1, dtype=np.int64) * nnz_per_row

    x0 = rng.uniform(0.2, 0.8, n_cols)
    ax0 = np.einsum("ij,ij->i", vals, x0[cols])
    slack = rng.uniform(0.1, 1.0, n_rows)
    n_eq = int(equality_fraction * n_rows)
    ub = ax0 + slack
    lb = np.full(n_rows, -np.inf)
    if n_eq:
        ub[:n_eq] = ax0[:n_eq]
        lb[:n_eq] = ax0[:n_eq]
    c = rng.uniform(0.0, 1.0, n_cols)

    return OptimizationProblem(
        offsets=offsets,
        indices=cols.reshape(-1),
        values=vals.reshape(-1),
        objective_coefficients=c,
        constraint_lower_bounds=lb,
        constraint_upper_bounds=ub,
        row_types=np.where(
            np.arange(n_rows) < n_eq, "E", "L"
        ).astype("U1"),
        rhs=ub.copy(),
        variable_lower_bounds=np.zeros(n_cols),
        variable_upper_bounds=np.ones(n_cols),
        variable_types=np.full(n_cols, "C", "U1"),
        variable_names=[f"x{j}" for j in range(n_cols)]
        if n_cols <= 200_000 else [],
        row_names=[f"r{i}" for i in range(n_rows)]
        if n_rows <= 200_000 else [],
        problem_name=f"synth_{n_rows}x{n_cols}",
    )
