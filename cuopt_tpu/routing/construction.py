"""Initial solution construction: cheapest feasible insertion.

Plays the role of the reference GES route construction seed
(cpp/src/routing/ges/guided_ejection_search.cuh builds from an ejection
pool); here a deterministic cheapest-insertion pass (optionally randomized
for restarts) produces the starting solution for the local search.
"""

from __future__ import annotations

import numpy as np

from cuopt_tpu.routing.internal import RoutingProblem


def cheapest_insertion(
    prob: RoutingProblem, rng: np.random.Generator | None = None,
    noise: float = 0.0,
) -> tuple[dict[int, list[int]], list[int]]:
    """Insert orders one by one at the cheapest feasible position.

    Returns (routes: vehicle -> [serve-order idx]), unassigned orders.
    Pickup-delivery pairs are inserted as (pickup, delivery) units.
    """
    rng = rng or np.random.default_rng(0)
    routes: dict[int, list[int]] = {v: [] for v in range(prob.n_fleet)}
    # order processing sequence: earliest time window, then demand
    keys = np.lexsort((-prob.demand.sum(axis=0), prob.tw_early))
    pending = [int(o) for o in keys]
    handled = set()
    unassigned: list[int] = []

    for o in pending:
        if o in handled:
            continue
        partner = -1
        if prob.pd_partner is not None and prob.pd_partner[o] >= 0:
            if prob.pd_sign[o] < 0:  # delivery: wait for its pickup
                continue
            partner = int(prob.pd_partner[o])
        best = None
        for v in range(prob.n_fleet):
            r = routes[v]
            if prob.allowed_vehicles is not None and not (
                prob.allowed_vehicles[o, v]
            ):
                continue
            base = prob.route_cost(v, r) if r else 0.0
            for i in range(len(r) + 1):
                cand = r[:i] + [o] + r[i:]
                if partner >= 0:
                    for j in range(i + 1, len(cand) + 1):
                        cand2 = cand[:j] + [partner] + cand[j:]
                        if prob.route_feasible(v, cand2):
                            delta = prob.route_cost(v, cand2) - base
                            if noise:
                                delta *= 1.0 + noise * rng.uniform(-1, 1)
                            if best is None or delta < best[0]:
                                best = (delta, v, cand2)
                else:
                    if prob.route_feasible(v, cand):
                        delta = prob.route_cost(v, cand) - base
                        if noise:
                            delta *= 1.0 + noise * rng.uniform(-1, 1)
                        if best is None or delta < best[0]:
                            best = (delta, v, cand)
        if best is None:
            unassigned.append(o)
            if partner >= 0:
                unassigned.append(partner)
                handled.add(partner)
        else:
            routes[best[1]] = best[2]
            handled.add(o)
            if partner >= 0:
                handled.add(partner)
        handled.add(o)
    return routes, unassigned


def greedy_reinsert(prob, routes, removed, rng=None, noise=0.1):
    """Reinsert removed orders (ruin & recreate step)."""
    rng = rng or np.random.default_rng(0)
    unassigned = []
    for o in removed:
        partner = -1
        if prob.pd_partner is not None and prob.pd_partner[o] >= 0 and \
                prob.pd_sign[o] > 0:
            partner = int(prob.pd_partner[o])
        elif prob.pd_partner is not None and prob.pd_sign[o] < 0:
            continue  # inserted with its pickup
        best = None
        for v in range(prob.n_fleet):
            if prob.allowed_vehicles is not None and not (
                prob.allowed_vehicles[o, v]
            ):
                continue
            r = routes[v]
            base = prob.route_cost(v, r) if r else 0.0
            for i in range(len(r) + 1):
                cand = r[:i] + [o] + r[i:]
                if partner >= 0:
                    for j in range(i + 1, len(cand) + 1):
                        cand2 = cand[:j] + [partner] + cand[j:]
                        if prob.route_feasible(v, cand2):
                            delta = prob.route_cost(v, cand2) - base
                            delta *= 1.0 + noise * rng.uniform(-1, 1)
                            if best is None or delta < best[0]:
                                best = (delta, v, cand2)
                else:
                    if prob.route_feasible(v, cand):
                        delta = prob.route_cost(v, cand) - base
                        delta *= 1.0 + noise * rng.uniform(-1, 1)
                        if best is None or delta < best[0]:
                            best = (delta, v, cand)
        if best is None:
            unassigned.append(o)
            if partner >= 0:
                unassigned.append(partner)
        else:
            routes[best[1]] = best[2]
    return routes, unassigned
