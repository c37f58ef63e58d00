"""Tests for GES route minimization, diversity/recombiners, prize logic.

Modeled on the reference routing test tiers (cpp/tests/routing/level0 GES
component tests + unit_tests per constraint; SURVEY.md §4).
"""

import numpy as np
import pytest

from cuopt_tpu import routing
from cuopt_tpu.routing.internal import build_problem
from cuopt_tpu.routing.diversity import (
    RoutingPopulation,
    solution_distance,
    srex,
    prize_filter,
)
from cuopt_tpu.routing.ges import feasible_insertions, minimize_routes
from cuopt_tpu.utils.timer import Timer


def _grid_model(n_loc=10, n_fleet=4, capacity=100, fixed_cost=0.0,
                seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 100, size=(n_loc, 2))
    pts[0] = (50, 50)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=2)
    dm = routing.DataModel(n_loc, n_fleet)
    dm.add_cost_matrix(d)
    demand = np.ones(n_loc, np.int32)
    demand[0] = 0
    dm.add_capacity_dimension(
        "w", demand, np.full(n_fleet, capacity, np.int32)
    )
    if fixed_cost:
        dm.set_vehicle_fixed_costs(np.full(n_fleet, fixed_cost))
    return dm


def test_ges_eliminates_routes_with_fixed_costs():
    dm = _grid_model(n_loc=12, n_fleet=6, capacity=100, fixed_cost=500.0)
    prob = build_problem(dm)
    # scatter orders across many vehicles
    orders = list(range(prob.n_serve))
    routes = {v: [] for v in range(prob.n_fleet)}
    for i, o in enumerate(orders):
        routes[i % prob.n_fleet].append(o)
    rng = np.random.default_rng(0)
    out = minimize_routes(prob, routes, Timer(30.0), rng, budget_s=20.0)
    served = sorted(o for r in out.values() for o in r)
    assert served == orders  # nothing lost
    used_before = sum(1 for r in routes.values() if r)
    used_after = sum(1 for r in out.values() if r)
    assert used_after <= used_before
    # capacity 100 >> 11 orders: a single route should be reachable
    assert used_after <= 2


def test_feasible_insertions_respects_capacity():
    dm = _grid_model(n_loc=6, n_fleet=2, capacity=2)
    prob = build_problem(dm)
    routes = {0: [0, 1], 1: []}
    cands = feasible_insertions(prob, routes, 2)
    assert cands
    assert all(v == 1 for _, v, _ in cands)  # vehicle 0 is full


def test_population_orders_and_dedups():
    dm = _grid_model(n_loc=8, n_fleet=3)
    prob = build_problem(dm)
    pop = RoutingPopulation(max_size=4)
    r1 = {0: list(range(prob.n_serve)), 1: [], 2: []}
    r2 = {0: list(reversed(range(prob.n_serve))), 1: [], 2: []}
    assert pop.add(prob, r1, [])
    assert not pop.add(prob, r1, [])  # duplicate rejected
    pop.add(prob, r2, [])
    assert pop.best["cost"] == min(m["cost"] for m in pop.members)
    assert 0.0 <= solution_distance(r1, r2) <= 1.0


def test_srex_preserves_all_orders():
    dm = _grid_model(n_loc=10, n_fleet=4)
    prob = build_problem(dm)
    rng = np.random.default_rng(1)
    n = prob.n_serve
    ra = {0: list(range(n // 2)), 1: list(range(n // 2, n)), 2: [], 3: []}
    rb = {0: [], 1: [], 2: list(range(0, n, 2)),
          3: list(range(1, n, 2))}
    pa = dict(routes=ra, unassigned=[])
    pb = dict(routes=rb, unassigned=[])
    child, unassigned = srex(prob, pa, pb, rng)
    served = sorted(o for r in child.values() for o in r)
    assert sorted(served + list(unassigned)) == list(range(n))
    assert len(set(served)) == len(served)  # no duplicates


def test_prize_filter_drops_unprofitable():
    # order 1 is very far; its prize is tiny -> dropping it pays
    n = 4
    d = np.array([
        [0, 1, 100, 1],
        [1, 0, 100, 1],
        [100, 100, 0, 100],
        [1, 1, 100, 0],
    ], float)
    dm = routing.DataModel(n, 1)
    dm.add_cost_matrix(d)
    dm.set_order_prizes(np.array([0.0, 5.0, 1.0, 5.0]))
    prob = build_problem(dm)
    routes = {0: list(range(prob.n_serve))}
    out, unassigned = prize_filter(prob, routes, [])
    far = [i for i in range(prob.n_serve)
           if prob.order_loc[i] == 2]
    assert far and far[0] in unassigned


def test_solve_with_fixed_costs_uses_few_vehicles():
    dm = _grid_model(n_loc=10, n_fleet=5, capacity=100, fixed_cost=200.0)
    settings = routing.SolverSettings()
    settings.time_limit = 8.0
    sol = routing.Solve(dm, settings)
    assert sol.get_status() == 0
    assert sol.get_vehicle_count() <= 2


def test_prize_moves_inside_local_search():
    """LS alone (no population filter) improves the net prize objective:
    the in-tensor drop family removes an unprofitable far order and the
    pickup step inserts an unserved profitable one (reference scores
    prize moves inside the LS candidate tensors,
    local_search/local_search.cuh:102-160)."""
    from cuopt_tpu.routing.local_search import build_ls_problem
    from cuopt_tpu.routing.solver import _local_search
    from cuopt_tpu.utils.timer import Timer

    n = 5
    d = np.array([
        [0, 1, 100, 1, 2],
        [1, 0, 100, 1, 2],
        [100, 100, 0, 100, 100],
        [1, 1, 100, 0, 2],
        [2, 2, 100, 2, 0],
    ], float)
    dm = routing.DataModel(n, 1)
    dm.add_cost_matrix(d)
    # order at loc 2 is 200 cost round-trip for prize 1 -> drop;
    # order at loc 4 is ~4 cost for prize 50 -> pickup
    dm.set_order_prizes(np.array([0.0, 5.0, 1.0, 5.0, 50.0]))
    prob = build_problem(dm)
    lsp = build_ls_problem(prob)
    far = [i for i in range(prob.n_serve) if prob.order_loc[i] == 2][0]
    good = [i for i in range(prob.n_serve) if prob.order_loc[i] == 4][0]
    serve_wo_good = [i for i in range(prob.n_serve) if i != good]
    routes = {0: serve_wo_good}
    unserved = [good]

    def net(routes, unserved):
        cost = sum(prob.route_cost(v, r) for v, r in routes.items() if r)
        lost = sum(float(prob.prizes[o]) for o in unserved)
        return cost + lost  # minimizing cost + foregone prizes

    before = net(routes, unserved)
    out = _local_search(prob, lsp, routes, Timer(30), max_rounds=6,
                        unserved=unserved)
    after = net(out, unserved)
    served = [o for r in out.values() for o in r]
    assert far in unserved            # unprofitable order dropped
    assert good in served             # profitable order picked up
    assert after < before - 50.0      # net objective improved


def test_lexicographic_nonconsecutive_ejection_unlocks_insertion():
    """A capacity-tight route where serving the pooled order requires
    ejecting the FIRST and LAST orders (demand 5 each, positions 0 and
    5): every consecutive window of <= 4 frees at most 5, so the r04
    consecutive-segment search provably fails; the lexicographic
    non-consecutive subset search (reference
    ges/guided_ejection_search.cuh:49-81, k<=6 subsets) finds {first,
    last} and inserts (VERDICT r05 #7)."""
    from cuopt_tpu.routing.ges import _ejection_insertions

    n = 7  # orders 0..6 at locations 1..7
    d = np.ones((8, 8), float) - np.eye(8)
    dm = routing.DataModel(8, 1)
    dm.add_cost_matrix(d)
    demand = np.array([0, 5, 0, 0, 0, 0, 5, 10], float)
    dm.add_capacity_dimension("w", demand, np.array([10.0]))
    prob = build_problem(dm)
    # identify serve-order indices by demand
    dem = prob.demand[0]
    heavy = [i for i in range(prob.n_serve) if dem[i] == 5]
    zero = [i for i in range(prob.n_serve) if dem[i] == 0]
    o_big = [i for i in range(prob.n_serve) if dem[i] == 10][0]
    route = [heavy[0]] + zero + [heavy[1]]  # load 10 = capacity
    routes = {0: route}
    penalties = np.ones(prob.n_serve)

    consec = _ejection_insertions(
        prob, {0: list(route)}, o_big, penalties, nc_k_max=1
    )
    assert consec is None  # consecutive windows cannot free 10

    lex = _ejection_insertions(
        prob, {0: list(route)}, o_big, penalties, nc_k_max=3
    )
    assert lex is not None
    p_sum, v, new_r, ejected = lex
    assert sorted(ejected) == sorted(heavy)
    assert o_big in new_r
