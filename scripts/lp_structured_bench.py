"""Structured-LP benchmark on the real TPU (VERDICT r04 #8): the
Mittelmann-class generator families at >=100k rows, solved by PDLP with
the compile/solve split recorded, plus the shrunken-copy dual-simplex
cross-check (the full-size gate is PDLP-vs-PDLP across two presets).

Usage: python scripts/lp_structured_bench.py [--scale 100000 --out ...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/cuopt_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                      "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=100_000)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--time-limit", type=float, default=600.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from cuopt_tpu import constants as C
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.lp.solve import solve_lp
    from cuopt_tpu.problem.mittelmann import GENERATORS

    results = []
    for name, gen in sorted(GENERATORS.items()):
        t0 = time.perf_counter()
        prob = gen(args.scale, 0)
        gen_s = time.perf_counter() - t0
        s = PDLPSolverSettings()
        # Concurrent (reference solve.cu:467): the host dual simplex
        # races TPU PDLP — degenerate families (degen-transport spun
        # 483k PDHG iterations into the r05 time limit) fall to the
        # simplex in seconds, huge well-conditioned ones to PDLP
        s.method = C.CUOPT_METHOD_CONCURRENT
        s.set_optimality_tolerance(args.tol)
        s.time_limit = args.time_limit
        s.dtype = "float32"
        t0 = time.perf_counter()
        sol = solve_lp(prob, s)
        raw = sol._raw
        _ = np.asarray(raw["primal_solution"][:4])  # tunnel sync
        wall = time.perf_counter() - t0
        r = {
            "family": name,
            "rows": prob.n_constraints,
            "cols": prob.n_variables,
            "nnz": prob.nnz,
            "generate_s": round(gen_s, 2),
            "status": int(raw["status"]),
            "objective": float(raw["primal_objective"]),
            "iterations": int(raw["iterations"]),
            "wall_s": round(wall, 2),
            "solved_by": raw.get("solved_by", "pdlp"),
            "compile_s": raw.get("compile_s"),
            "solve_loop_s": raw.get("solve_loop_s"),
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    ok = [r for r in results
          if r["status"] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL]
    solve_times = [max(r["solve_loop_s"] or r["wall_s"], 1e-3)
                   for r in ok]
    summary = {
        "scale": args.scale,
        "families": len(results),
        "solved_optimal": len(ok),
        "geomean_solve_loop_s": round(math.exp(
            sum(math.log(t) for t in solve_times) / len(solve_times)
        ), 3) if solve_times else None,
        "geomean_iters_per_s": round(math.exp(sum(
            math.log(max(r["iterations"], 1)
                     / max(r["solve_loop_s"] or r["wall_s"], 1e-3))
            for r in ok) / len(ok)), 1) if ok else None,
        "results": results,
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LP_STRUCTURED_r05.json",
    )
    json.dump(summary, open(out, "w"), indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "results"}))


if __name__ == "__main__":
    main()
