"""Benchmark: PDHG iterations/second on a synthetic sparse LP, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The driver's north star (BASELINE.json) is the Mittelmann-set geomean +
PDHG iters/s. The Mittelmann instances are network downloads (reference
benchmarks/linear_programming/utils/get_datasets.py) and unavailable
offline, so the recorded metric is PDHG iterations/s on a fixed synthetic
LP (50k rows x 50k cols, 8 nnz/row, f32) — the same quantity cuOpt's
harness reports per instance, on a reproducible instance.

The instance has staircase (banded) structure — the dominant sparsity
pattern of the Mittelmann families (multiperiod, multicommodity, network
LPs) — which the TPU build exploits with the BlockBandOp MXU operator
(cuopt_tpu/sparse/ops.py): dense column-window slabs per 128-row tile
instead of gathers. On this instance the operator is ~22x faster than the
gather-based ELL/CSR fallbacks used for unstructured matrices.

vs_baseline references 1000 iters/s — an H100-class cuOpt PDLP rate on
problems of this size (order-of-magnitude anchor; the reference publishes
no numeric tables, BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

N_ROWS = 50_000
N_COLS = 50_000
NNZ_PER_ROW = 8
BAND = 256
WARMUP_MAJORS = 2
BENCH_MAJORS = 50
BASELINE_ITERS_PER_S = 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from cuopt_tpu.lp.hyper_params import PRESETS
    from cuopt_tpu.lp.pdlp import (
        StaticCfg,
        build_device_problem,
        initial_state,
        make_major_fn,
    )
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.problem.synthetic import generate_lp

    prob = generate_lp(N_ROWS, N_COLS, NNZ_PER_ROW, seed=123, band=BAND)
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
    dev = build_device_problem(prob, hp, jnp.float32, "blockband")
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

    iters_per_s = steps / elapsed
    print(json.dumps({
        "metric": "pdhg_iters_per_s_synth50k_staircase",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
