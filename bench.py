"""Benchmark: PDHG iterations/second on synthetic sparse LPs, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

The driver's north star (BASELINE.json) is the Mittelmann-set geomean +
"PDHG step at memory-bandwidth speed-of-light per chip". The Mittelmann
instances are network downloads (reference benchmarks/linear_programming/
utils/get_datasets.py) and unavailable offline, so the bench measures:

  1. "staircase": 50k x 50k banded LP — the dominant Mittelmann pattern
     (multiperiod/multicommodity/network LPs). The fused Pallas PDHG
     kernel (lp/pdhg_pallas.py) serves it: ONE pass over the row slabs
     per iteration computes Ax -> dual prox -> A^T y.
  2. "shuffled": the same matrix under a random row+col permutation; the
     operator must recover the band via reordering (sparse/reorder.py).
  3. "stream_rate": a pure slab-streaming Pallas kernel, reported for
     context (it under-pipelines, so it can UNDERESTIMATE the true HBM
     rate).

vs_baseline is the fraction of HBM speed-of-light the PDHG step
achieves: (slab bytes read per step / step time) / max(stream_rate,
v5e spec 819 GB/s). 1.0 = the memory-bound ideal of BASELINE.json; no
reference wall-clock exists to compare against offline (BASELINE.md:
the reference publishes no numbers).

Precision note: all numbers are full-f32 SpMV (kernel max error vs f64
ground truth ~7e-7 on the bench instance). Round-2's 2,456 it/s geomean
was produced by XLA's DEFAULT matmul precision, which lowers f32 einsums
to bf16 passes on TPU (measured 1.6e-2 relative SpMV error) — faster
bytes, wrong math; ops.py now forces HIGHEST precision on the fallback
einsum path.

Also recorded in detail: the virtual-mesh weak-scaling table artifact
(WEAKSCALING_r03.json) when present — structural validation + an HLO
collective-volume model (a CPU mesh cannot measure bandwidth).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

# persistent XLA compile cache: the fused-PDHG major program takes
# minutes to compile over this environment's remote-compile tunnel;
# cache it across bench invocations
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/cuopt_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

N_ROWS = 50_000
N_COLS = 50_000
NNZ_PER_ROW = 8
BAND = 256
WARMUP_MAJORS = 2
BENCH_MAJORS = 40


def _bench_instance(prob, cfg, hp, operator_kind):
    import jax
    import numpy as np
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
    start_steps = int(np.asarray(report["total_steps"]))  # forces sync

    t0 = time.perf_counter()
    for _ in range(BENCH_MAJORS):
        state, report = fn(dev, state)
    steps = int(np.asarray(report["total_steps"])) - start_steps
    elapsed = time.perf_counter() - t0
    inner = dev.op
    slab_bytes = int(inner.row_slabs.size) * 4
    return steps / elapsed, slab_bytes, steps, elapsed


def _stream_rate(T=392, W=384, iters=60):
    """Measured HBM streaming speed-of-light for the slab access pattern
    (read (G,128,W) blocks, trivial compute)."""
    from functools import partial

    import jax
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        return None
    G = 8
    slabs = jnp.asarray(
        np.random.default_rng(0).random((T, 128, W), np.float32)
    )
    rows = jnp.zeros((T, 128), jnp.float32)

    def k(slab_ref, y_ref, out_ref):
        acc = jnp.zeros((1, 128), jnp.float32)
        for i in range(G):
            acc = acc + jnp.sum(
                slab_ref[i][:, 0:128], axis=0
            ).reshape(1, 128)
        out_ref[...] = jnp.broadcast_to(acc, (G, 128)) + y_ref[...] * 1e-9

    gs = pl.GridSpec(
        grid=(T // G,),
        # index components all derive from g (mixed i32/i64 constants
        # fail Mosaic legalization on this toolchain)
        in_specs=[pl.BlockSpec((G, 128, W), lambda g: (g, g * 0, g * 0)),
                  pl.BlockSpec((G, 128), lambda g: (g, g * 0))],
        out_specs=pl.BlockSpec((G, 128), lambda g: (g, g * 0)),
    )

    def call(y):
        return pl.pallas_call(
            k, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
        )(slabs, y)

    @partial(jax.jit, static_argnums=(1,))
    def loop(y, n):
        return jax.lax.fori_loop(0, n, lambda i, y: call(y), y)

    r = loop(rows, iters)
    np.asarray(r)
    t0 = time.perf_counter()
    r = loop(rows, iters)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    return slabs.size * 4 / dt


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
    stair, slab_bytes, steps_s, el_s = _bench_instance(
        prob, cfg, hp, "auto"
    )

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
    unstructured, shuf_bytes, _, _ = _bench_instance(
        shuffled, cfg, hp, "auto"
    )

    stream = _stream_rate()
    geomean = math.sqrt(stair * unstructured)
    # vs_baseline: GEOMEAN of the two instances' effective bandwidths
    # over the speed-of-light denominator (the r03 number used the
    # staircase alone, overstating the general case — VERDICT weak #3)
    eff_stair = stair * slab_bytes
    eff_shuf = unstructured * shuf_bytes
    eff_gbps = math.sqrt(eff_stair * eff_shuf)
    # speed-of-light denominator: the v5e HBM spec (819 GB/s) or the
    # measured stream rate, whichever is HIGHER — the naive stream
    # kernel under-pipelines and must not inflate the fraction
    sol = max(stream or 0.0, 819e9)
    sol_fraction = eff_gbps / sol

    detail = {
        "staircase_iters_per_s": round(stair, 2),
        "shuffled_unstructured_iters_per_s": round(unstructured, 2),
        "slab_bytes_per_iter": slab_bytes,
        "shuffled_slab_bytes_per_iter": shuf_bytes,
        "staircase_effective_gbps": round(eff_stair / 1e9, 1),
        "shuffled_effective_gbps": round(eff_shuf / 1e9, 1),
        "pdhg_effective_gbps_geomean": round(eff_gbps / 1e9, 1),
        "measured_stream_kernel_gbps":
            round(stream / 1e9, 1) if stream else None,
        "speed_of_light_denominator_gbps": round(sol / 1e9, 1),
        "precision": "f32 SpMV (HIGHEST); see module docstring re r02 "
                     "bf16 comparison",
    }
    here = os.path.dirname(os.path.abspath(__file__))
    ws_candidates = sorted(
        f for f in os.listdir(here)
        if f.startswith("WEAKSCALING_r") and f.endswith(".json")
    )
    if ws_candidates:
        try:
            ws = json.load(open(os.path.join(here, ws_candidates[-1])))
            detail["weak_scaling_hlo_model"] = ws.get("hlo_analysis")
        except Exception:  # noqa: BLE001
            pass
    print(json.dumps({
        "metric": "pdhg_iters_per_s_synth50k_geomean",
        "value": round(geomean, 2),
        "unit": "iters/s",
        "vs_baseline": round(sol_fraction, 4),
        "detail": detail,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
