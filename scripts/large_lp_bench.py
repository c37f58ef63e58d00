"""Large-LP existence proof on one chip (VERDICT r03 item 4).

The reference solves 74.5M-row LPs on one H100 (docs faq.rst:368-372);
offline we cannot download Mittelmann instances, so this generates a
1M x 1M, 50M-nnz LP (banded control + a randomly row/col-permuted copy
that must be recovered by the seriation pipeline), solves both on the
real TPU to 1e-4, and records wall-clock / iterations / throughput /
device memory in LARGE_LP_r04.json. This is the scale test the 50k
bench cannot provide: slab/window memory behaviour, restart cadence and
f32 tail at 6 orders of magnitude more nonzeros than afiro.

Usage: python scripts/large_lp_bench.py [--rows 1000000 --nnz 50]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/cuopt_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _mem_stats():
    import jax

    try:
        st = jax.local_devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in st.items()
                if "bytes" in k and isinstance(v, (int, float))}
    except Exception:  # noqa: BLE001 — backend may not expose stats
        return {}


def solve_one(prob, label, tol):
    import numpy as np

    from cuopt_tpu import constants as C
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.lp.solve import solve_lp

    s = PDLPSolverSettings()
    s.method = C.CUOPT_METHOD_PDLP
    s.set_optimality_tolerance(tol)
    s.iteration_limit = 200_000
    s.dtype = "float32"  # fused Pallas path; f32-HIGHEST SpMV
    t0 = time.perf_counter()
    sol = solve_lp(prob, s)
    # force sync through the host copy (axon block_until_ready lies)
    _ = np.asarray(sol.get_primal_solution()[:8])
    wall = time.perf_counter() - t0
    # warm re-solve: program + slab build now cached, so this is the
    # honest solver wall-clock (the cold number includes the one-time
    # XLA compile via the remote-compile tunnel)
    t0 = time.perf_counter()
    sol = solve_lp(prob, s)
    _ = np.asarray(sol.get_primal_solution()[:8])
    warm = time.perf_counter() - t0
    raw = sol._raw
    iters = int(raw.get("iterations", 0))
    return {
        "label": label,
        "status": int(sol.get_termination_status()),
        "objective": float(sol.get_primal_objective()),
        "iterations": iters,
        "wall_s_cold": round(wall, 2),
        "wall_s": round(warm, 2),
        "compile_s": raw.get("compile_s"),
        "solve_loop_s": raw.get("solve_loop_s"),
        "iters_per_s": round(iters / max(warm, 1e-9), 1),
        "solved_by": raw.get("solved_by"),
        "device_memory": _mem_stats(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--nnz", type=int, default=50)
    ap.add_argument("--band", type=int, default=256)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from cuopt_tpu.problem.synthetic import generate_lp
    from cuopt_tpu.sparse.reorder import permute_csr

    N = args.rows
    t0 = time.perf_counter()
    prob = generate_lp(N, N, args.nnz, seed=11, band=args.band)
    gen_s = time.perf_counter() - t0
    print(f"generated {N}x{N} nnz={prob.nnz} in {gen_s:.1f}s",
          flush=True)

    results = {"rows": N, "cols": N, "nnz": int(prob.nnz),
               "tolerance": args.tol, "generate_s": round(gen_s, 1)}

    r = solve_one(prob, "banded", args.tol)
    print(json.dumps(r), flush=True)
    results["banded"] = r

    t0 = time.perf_counter()
    rng = np.random.default_rng(4)
    rp, cp = rng.permutation(N), rng.permutation(N)
    o, i, v = permute_csr(
        np.asarray(prob.offsets), np.asarray(prob.indices),
        np.asarray(prob.values, np.float64), rp, cp, N, N,
    )
    shuffled = dataclasses.replace(
        prob, offsets=o, indices=i, values=v,
        constraint_lower_bounds=prob.constraint_lower_bounds[rp],
        constraint_upper_bounds=prob.constraint_upper_bounds[rp],
        rhs=prob.rhs[rp], row_types=prob.row_types[rp],
        objective_coefficients=prob.objective_coefficients[cp],
        variable_lower_bounds=prob.variable_lower_bounds[cp],
        variable_upper_bounds=prob.variable_upper_bounds[cp],
    )
    results["shuffle_s"] = round(time.perf_counter() - t0, 1)
    r = solve_one(shuffled, "shuffled_unstructured", args.tol)
    print(json.dumps(r), flush=True)
    results["shuffled"] = r

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LARGE_LP_r04.json",
    )
    json.dump(results, open(out, "w"), indent=1)
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
