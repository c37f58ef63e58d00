"""Initial solution construction: cheapest feasible insertion.

Plays the role of the reference GES route construction seed
(cpp/src/routing/ges/guided_ejection_search.cuh builds from an ejection
pool); here a deterministic cheapest-insertion pass (optionally randomized
for restarts) produces the starting solution for the local search.
"""

from __future__ import annotations

import numpy as np

from cuopt_tpu.routing.internal import (
    RoutingProblem,
    insert_precedence_ok,
    order_arrival_times,
    precedence_depth,
)


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
    # order processing sequence: precedence depth first (predecessors
    # before successors), then earliest time window, then demand
    keys = np.lexsort((
        -prob.demand.sum(axis=0), prob.tw_early, precedence_depth(prob),
    ))
    pending = [int(o) for o in keys]
    handled = set()
    unassigned: list[int] = []
    prec = bool(prob.precedence)

    for o in pending:
        arr = order_arrival_times(prob, routes) if prec else None
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
                        if prob.route_feasible(v, cand2) and (
                            not prec
                            or insert_precedence_ok(prob, arr, v, cand2)
                        ):
                            delta = prob.route_cost(v, cand2) - base
                            if noise:
                                delta *= 1.0 + noise * rng.uniform(-1, 1)
                            if best is None or delta < best[0]:
                                best = (delta, v, cand2)
                else:
                    if prob.route_feasible(v, cand) and (
                        not prec
                        or insert_precedence_ok(prob, arr, v, cand)
                    ):
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
    """Reinsert removed orders (ruin & recreate step). With precedence
    constraints, insertion positions are filtered so the resulting
    arrival times respect every affected pair (precedence by
    construction, not post-hoc repair)."""
    rng = rng or np.random.default_rng(0)
    unassigned = []
    prec = bool(prob.precedence)
    if prec:
        depth = precedence_depth(prob)
        removed = sorted(removed, key=lambda o: (depth[int(o)], int(o)))
    for o in removed:
        arr = order_arrival_times(prob, routes) if prec else None
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
                        if prob.route_feasible(v, cand2) and (
                            not prec
                            or insert_precedence_ok(prob, arr, v, cand2)
                        ):
                            delta = prob.route_cost(v, cand2) - base
                            delta *= 1.0 + noise * rng.uniform(-1, 1)
                            if best is None or delta < best[0]:
                                best = (delta, v, cand2)
                else:
                    if prob.route_feasible(v, cand) and (
                        not prec
                        or insert_precedence_ok(prob, arr, v, cand)
                    ):
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
