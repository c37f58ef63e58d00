"""Benchmark: PDHG iterations/second on synthetic sparse LPs, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

The driver's north star (BASELINE.json) is the Mittelmann-set geomean +
PDHG iters/s. The Mittelmann instances are network downloads (reference
benchmarks/linear_programming/utils/get_datasets.py) and unavailable
offline, so the recorded metric is the GEOMEAN of PDHG iterations/s over
two fixed synthetic LPs (each 50k rows x 50k cols, 8 nnz/row, f32):

  1. "staircase": banded/staircase structure — the dominant pattern of
     the Mittelmann families (multiperiod, multicommodity, network LPs).
     The auto operator selects the BlockBandOp MXU slab path.
  2. "shuffled": the same matrix under a random row+column permutation —
     unstructured to the eye. The auto operator must recover the band via
     the bandwidth-reducing reordering (sparse/reorder.py + PermutedOp);
     this is the general-pattern case cuOpt serves with cusparse CSR SpMV
     (cusparse_view.hpp:30).

vs_baseline references 1000 iters/s — an H100-class cuOpt PDLP rate on
problems of this size (order-of-magnitude anchor; the reference publishes
no numeric tables, BASELINE.md).
"""

from __future__ import annotations

import json
import math
import sys
import time

N_ROWS = 50_000
N_COLS = 50_000
NNZ_PER_ROW = 8
BAND = 256
WARMUP_MAJORS = 2
BENCH_MAJORS = 50
BASELINE_ITERS_PER_S = 1000.0


def _bench_instance(prob, cfg, hp, operator_kind):
    import jax
    import jax.numpy as jnp

    from cuopt_tpu.lp.pdlp import (
        build_device_problem,
        initial_state,
        make_major_fn,
    )

    dev = build_device_problem(prob, hp, jnp.float32, operator_kind)
    state = initial_state(dev, hp, jnp.float32)
    fn = make_major_fn(cfg)

    for _ in range(WARMUP_MAJORS):
        state, report = fn(dev, state)
    jax.block_until_ready(report)
    start_steps = int(report["total_steps"])

    t0 = time.perf_counter()
    for _ in range(BENCH_MAJORS):
        state, report = fn(dev, state)
    jax.block_until_ready(report)
    elapsed = time.perf_counter() - t0
    steps = int(report["total_steps"]) - start_steps
    return steps / elapsed


def main():
    import numpy as np

    from cuopt_tpu.lp.hyper_params import PRESETS
    from cuopt_tpu.lp.pdlp import StaticCfg
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.problem.synthetic import generate_lp
    from cuopt_tpu.sparse.reorder import permute_csr

    settings = PDLPSolverSettings()
    hp = PRESETS[settings.pdlp_solver_mode]
    t = settings.tolerances
    cfg = StaticCfg(
        hp=hp,
        abs_primal=t.absolute_primal_tolerance,
        rel_primal=t.relative_primal_tolerance,
        abs_dual=t.absolute_dual_tolerance,
        rel_dual=t.relative_dual_tolerance,
        abs_gap=t.absolute_gap_tolerance,
        rel_gap=t.relative_gap_tolerance,
    )

    prob = generate_lp(N_ROWS, N_COLS, NNZ_PER_ROW, seed=123, band=BAND)
    staircase = _bench_instance(prob, cfg, hp, "auto")

    # unstructured: same instance under a random row+col permutation
    rng = np.random.default_rng(7)
    rp, cp = rng.permutation(N_ROWS), rng.permutation(N_COLS)
    offs, idx, vals = permute_csr(
        np.asarray(prob.offsets), np.asarray(prob.indices),
        np.asarray(prob.values, np.float64), rp, cp, N_ROWS, N_COLS,
    )
    import dataclasses
    shuffled = dataclasses.replace(
        prob, offsets=offs, indices=idx, values=vals,
        constraint_lower_bounds=prob.constraint_lower_bounds[rp],
        constraint_upper_bounds=prob.constraint_upper_bounds[rp],
        objective_coefficients=prob.objective_coefficients[cp],
        variable_lower_bounds=prob.variable_lower_bounds[cp],
        variable_upper_bounds=prob.variable_upper_bounds[cp],
    )
    unstructured = _bench_instance(shuffled, cfg, hp, "auto")

    geomean = math.sqrt(staircase * unstructured)
    print(json.dumps({
        "metric": "pdhg_iters_per_s_synth50k_geomean",
        "value": round(geomean, 2),
        "unit": "iters/s",
        "vs_baseline": round(geomean / BASELINE_ITERS_PER_S, 4),
        "detail": {
            "staircase_iters_per_s": round(staircase, 2),
            "shuffled_unstructured_iters_per_s": round(unstructured, 2),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
