"""Routing scale benchmark: 1,000-order CVRPTW (reference capacity
statement: 15K locations, docs/faq.rst:241; VERDICT r02 asked for a
1,000-order instance improving in seconds).

Emits a JSON artifact: construction cost, final cost, improvement %,
wall time. Run on CPU or TPU; the search loop is the jitted move
evaluator either way.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--orders", type=int, default=1000)
    ap.add_argument("--time-limit", type=float, default=60.0)
    ap.add_argument("--out", default=os.path.join(
        REPO, "ROUTING_SCALE_r03.json"))
    args = ap.parse_args()

    from cuopt_tpu.io.vrp import solution_cost, synth_gh_instance
    from cuopt_tpu.routing.construction import batched_construction
    from cuopt_tpu.routing.internal import build_problem
    from cuopt_tpu.routing.local_search import build_ls_problem
    from cuopt_tpu.routing.settings import SolverSettings
    from cuopt_tpu.routing.solver import Solve

    inst = synth_gh_instance(args.orders, "RC", seed=7)
    dm = inst.to_data_model()
    prob = build_problem(dm)
    lsp = build_ls_problem(prob)
    prob._lsp_cache = lsp

    t0 = time.time()
    base_routes, base_un = batched_construction(prob, lsp)
    t_constr = time.time() - t0
    base_cost = sum(
        prob.route_cost(v, r) for v, r in base_routes.items() if r
    )

    s = SolverSettings()
    s.time_limit = args.time_limit
    t0 = time.time()
    sol = Solve(dm, s)
    t_solve = time.time() - t0
    cost, used = solution_cost(inst, sol)

    art = {
        "orders": args.orders,
        "fleet": inst.n_vehicles,
        "construction_cost": round(float(base_cost), 1),
        "construction_s": round(t_constr, 1),
        "unassigned_after_construction": len(base_un),
        "final_cost": round(float(cost), 1),
        "vehicles_used": used,
        "improvement_pct": round(
            100 * (base_cost - cost) / base_cost, 2
        ),
        "time_limit_s": args.time_limit,
        "solve_s": round(t_solve, 1),
        "status": int(sol.status),
    }
    json.dump(art, open(args.out, "w"), indent=1)
    print(json.dumps(art))


if __name__ == "__main__":
    main()
