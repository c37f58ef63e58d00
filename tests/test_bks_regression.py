"""Routing quality regression on a Gehring-Homberger-CLASS instance
(reference gate: l2_routing_test.cu:33-53 scores BKS gaps on the real GH
set, which is a network download; scripts/bks_benchmark.py provides the
full harness + recorded-baseline regression)."""

import numpy as np

from cuopt_tpu.io.vrp import solution_cost, synth_gh_instance
from cuopt_tpu.routing.construction import cheapest_insertion
from cuopt_tpu.routing.internal import build_problem
from cuopt_tpu.routing.settings import SolverSettings
from cuopt_tpu.routing.solver import Solve


def test_gh100_improves_over_construction():
    inst = synth_gh_instance(100, "RC", seed=5)
    dm = inst.to_data_model()
    prob = build_problem(dm)
    base_routes, base_un = cheapest_insertion(prob)
    assert not base_un
    base_cost = sum(
        prob.route_cost(v, r) for v, r in base_routes.items() if r
    )

    s = SolverSettings()
    s.time_limit = 12
    sol = Solve(dm, s)
    assert sol.status == 0, sol.message
    cost, used = solution_cost(inst, sol)
    served = sol.get_route()
    served = served[served["type"].isin(["Delivery", "Pickup"])]
    assert len(served) == 100  # every customer served exactly once
    assert len(set(served["route"])) == 100
    # the metaheuristic must improve on plain cheapest insertion
    assert cost < base_cost * 0.97, (cost, base_cost)
