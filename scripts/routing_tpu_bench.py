"""Routing device-path benchmark on the real TPU (VERDICT r03 item 5).

Regenerates ROUTING_TPU_r{N}.json reproducibly: a synthetic
Gehring-Homberger-style CVRPTW instance, solved with the device-batched
construction (one fixed-shape insertion-scoring program per round) and
the batched local-search evaluator. Records construction wall-clock,
mean LS round time, and the improvement trajectory.

Usage: python scripts/routing_tpu_bench.py [--orders 1000 --out ...]
"""

from __future__ import annotations

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--orders", type=int, default=1000)
    ap.add_argument("--ls-rounds", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from cuopt_tpu.io.vrp import synth_gh_instance
    from cuopt_tpu.routing.construction import batched_construction
    from cuopt_tpu.routing.internal import build_problem
    from cuopt_tpu.routing.local_search import build_ls_problem
    from cuopt_tpu.routing.solver import _local_search
    from cuopt_tpu.utils.timer import Timer

    import jax

    inst = synth_gh_instance(args.orders, "RC", seed=7)
    dm = inst.to_data_model()
    prob = build_problem(dm)

    def total_cost(prob, routes):
        return sum(prob.route_cost(v, r)
                   for v, r in routes.items() if r)
    t0 = time.perf_counter()
    lsp = build_ls_problem(prob)
    prob._lsp_cache = lsp
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    routes, unassigned = batched_construction(prob, lsp)
    cons_s = time.perf_counter() - t0
    cost0 = total_cost(prob, routes)
    n_routes = sum(1 for r in routes.values() if r)
    print(f"construction: {cons_s:.1f}s cost={cost0:.1f} "
          f"routes={n_routes} unassigned={len(unassigned)}", flush=True)

    # timed LS rounds: run _local_search with a bounded round count and
    # measure the steady-state per-round wall (first round includes the
    # evaluator compile; report both)
    t0 = time.perf_counter()
    routes1 = _local_search(prob, lsp, routes, Timer(3600.0),
                            max_rounds=1)
    first_round_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    routes2 = _local_search(prob, lsp, routes1, Timer(3600.0),
                            max_rounds=args.ls_rounds)
    ls_s = time.perf_counter() - t0
    cost1 = total_cost(prob, routes2)
    per_round = ls_s / max(args.ls_rounds, 1)
    print(f"LS: first round {first_round_s:.1f}s (incl compile), "
          f"{args.ls_rounds} rounds {ls_s:.1f}s "
          f"({per_round * 1e3:.0f} ms/round), cost {cost0:.1f} -> "
          f"{cost1:.1f}", flush=True)

    # per-call dispatch+sync floor of this backend: every construction
    # round / LS round costs at least one device round trip, which over
    # the axon tunnel is ~0.3-1 s (vs ~100 us on local TPU hardware) —
    # the denominator for judging the per-round numbers below
    import jax.numpy as jnp

    tiny = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    _ = np.asarray(tiny(z))
    floors = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(tiny(z))
        floors.append(time.perf_counter() - t0)
    floors.sort()

    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "per_call_sync_floor_s": round(floors[len(floors) // 2], 3),
        "orders": args.orders,
        "fleet": int(prob.n_fleet),
        "ls_problem_build_s": round(build_s, 2),
        "construction_s": round(cons_s, 2),
        "construction_cost": round(cost0, 2),
        "routes_used": n_routes,
        "unassigned": len(unassigned),
        "ls_first_round_s_incl_compile": round(first_round_s, 2),
        "ls_rounds_timed": args.ls_rounds,
        "ls_ms_per_round": round(per_round * 1e3, 1),
        "cost_after_ls": round(cost1, 2),
        "improvement_pct": round(100 * (cost0 - cost1)
                                 / max(cost0, 1e-9), 2),
    }
    path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ROUTING_TPU_r04.json",
    )
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
