"""Move-evaluator consistency tests.

Randomized verification of the jitted move scorer
(cuopt_tpu/routing/local_search.evaluate_moves) against the exact host
model — the analogue of the reference's lexicographic brute-force
verifier used for GES/local-search kernels
(cpp/src/routing/ges/lexicographic_search/, cpp/tests/routing/level0).

For random CVRP(TW) instances and random feasible incumbents, the best
device-scored move must (a) predict exactly the objective delta obtained
by applying it on the host, and (b) preserve feasibility of the touched
routes under the exact host model.
"""

import numpy as np
import pytest

from cuopt_tpu.routing import DataModel
from cuopt_tpu.routing.internal import build_problem
from cuopt_tpu.routing.local_search import build_ls_problem, evaluate_moves
from cuopt_tpu.routing.solver import _apply_move, _routes_to_arrays


def random_instance(rng, n_loc=9, fleet=3, tw=False):
    pts = rng.uniform(0, 100, (n_loc, 2))
    cost = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    dm = DataModel(n_loc, fleet, n_loc - 1)
    dm.add_cost_matrix(cost)
    dm.set_order_locations(np.arange(1, n_loc))
    demand = rng.integers(1, 4, n_loc - 1)
    dm.add_capacity_dimension("w", demand, np.full(fleet, 12))
    if tw:
        dm.add_transit_time_matrix(cost)
        early = rng.uniform(0, 50, n_loc - 1)
        late = early + rng.uniform(150, 400, n_loc - 1)
        dm.set_order_time_windows(early, late)
        dm.set_order_service_times(np.full(n_loc - 1, 2.0))
    return dm


def random_routes(rng, prob):
    orders = list(rng.permutation(prob.n_serve))
    cuts = sorted(rng.choice(len(orders) + 1, prob.n_fleet - 1))
    routes, lo = {}, 0
    bounds = list(cuts) + [len(orders)]
    for v in range(prob.n_fleet):
        routes[v] = [int(o) for o in orders[lo:bounds[v]]]
        lo = bounds[v]
    return routes


@pytest.mark.parametrize("tw", [False, True])
def test_best_move_delta_matches_host(tw):
    rng = np.random.default_rng(42 if tw else 7)
    n_checked = 0
    for trial in range(6):
        dm = random_instance(rng, tw=tw)
        prob = build_problem(dm)
        lsp = build_ls_problem(prob)
        routes = random_routes(rng, prob)
        if not all(
            prob.route_feasible(v, r) for v, r in routes.items()
        ):
            continue
        L_pad = max(8, max(len(r) for r in routes.values()) + 4)
        R, lens = _routes_to_arrays(prob, routes, L_pad)
        delta, kind, mv = evaluate_moves(lsp, R, lens)
        if float(delta) >= -1e-7:
            continue
        before = prob.solution_cost(routes)
        new_routes = _apply_move(
            {v: list(r) for v, r in routes.items()}, kind, mv
        )
        after = prob.solution_cost(new_routes)
        assert after - before == pytest.approx(float(delta), abs=1e-3)
        for v in (int(mv[0]), int(mv[2])):
            assert prob.route_feasible(v, new_routes[v]), (
                f"kind={int(kind)} mv={np.asarray(mv)} trial={trial}"
            )
        n_checked += 1
    assert n_checked >= 3


def test_two_opt_star_descends_to_uncrossed_tails():
    # Two vehicles on a line; incumbent routes cross mid-way. Tail
    # exchange (or an equivalent-cost move sequence) must untangle them.
    #   depot at 0; locations 1..4 at x = 1, 2, 101, 102.
    x = np.array([0.0, 1.0, 2.0, 101.0, 102.0])
    cost = np.abs(x[:, None] - x[None])
    dm = DataModel(5, 2, 4)
    dm.add_cost_matrix(cost)
    dm.set_order_locations([1, 2, 3, 4])
    prob = build_problem(dm)
    lsp = build_ls_problem(prob)
    # crossed: v0 serves near then far, v1 serves near then far.
    routes = {0: [0, 2], 1: [1, 3]}  # orders 0,1 near; 2,3 far
    for _ in range(12):
        R, lens = _routes_to_arrays(prob, routes, 8)
        delta, kind, mv = evaluate_moves(lsp, R, lens)
        if float(delta) >= -1e-7:
            break
        routes = _apply_move(routes, kind, mv)
    # optimum: a single sweep 0->1->2->101->102->0 = 204 (the crossed
    # incumbent costs 2*102 + 2*101 + ... > 204).
    assert prob.solution_cost(routes) == pytest.approx(204.0, abs=1e-6)


def test_route_merge_does_not_overflow_padding():
    # ADVICE.md (high): 2-opt* can merge two routes into one longer than
    # the padded width computed before the loop; _routes_to_arrays then
    # crashed with a broadcast error. Two 6-order routes on a line where
    # merging everything onto one vehicle is optimal (large fixed costs).
    from cuopt_tpu.routing.settings import SolverSettings
    from cuopt_tpu.routing.solver import Solve

    x = np.concatenate([[0.0], np.arange(1.0, 13.0)])
    cost = np.abs(x[:, None] - x[None])
    dm = DataModel(13, 2, 12)
    dm.add_cost_matrix(cost)
    dm.set_order_locations(np.arange(1, 13))
    dm.set_vehicle_fixed_costs(np.array([100.0, 100.0]))
    s = SolverSettings()
    s.time_limit = 10.0
    sol = Solve(dm, s)  # must not raise
    assert sol.get_status() == 0
    # optimal: one vehicle sweeps 0..12..0 = 24 travel + 100 fixed
    assert sol.get_total_objective() <= 224.0 + 1e-6


def test_or_opt_moves_adjacent_pair_together():
    # Segment (a, b) sits in the wrong route; moving the orders one at a
    # time is cost-increasing but moving the pair is improving when the
    # intermediate states are blocked by capacity.
    x = np.array([0.0, 50.0, 51.0, 1.0, 2.0])
    cost = np.abs(x[:, None] - x[None])
    dm = DataModel(5, 2, 4)
    dm.add_cost_matrix(cost)
    dm.set_order_locations([1, 2, 3, 4])
    # orders 0,1 (locs 50,51) and 2,3 (locs 1,2)
    dm.add_capacity_dimension(
        "w", np.array([1, 1, 1, 1]), np.array([2, 2])
    )
    prob = build_problem(dm)
    lsp = build_ls_problem(prob)
    routes = {0: [0, 1], 1: [2, 3]}
    # both routes at capacity: single relocate is capacity-infeasible,
    # swaps/2-opt* only shuffle; verify evaluator terminates cleanly at
    # a local optimum without proposing an infeasible move.
    R, lens = _routes_to_arrays(prob, routes, 8)
    delta, kind, mv = evaluate_moves(lsp, R, lens)
    if float(delta) < -1e-7:
        new_routes = _apply_move(
            {v: list(r) for v, r in routes.items()}, kind, mv
        )
        for v in (int(mv[0]), int(mv[2])):
            assert prob.route_feasible(v, new_routes[v])


def test_pdp_pair_relocate_improves():
    """Paired relocate polish must measurably improve a deliberately bad
    PDP construction (reference PDP solver template with paired
    relocations, solver.cu:85-86): without it, PD-paired orders are
    excluded from every pairwise device move."""
    import numpy as np

    from cuopt_tpu.routing.data_model import DataModel
    from cuopt_tpu.routing.internal import build_problem
    from cuopt_tpu.routing.solver import _pdp_pair_improve
    from cuopt_tpu.utils.timer import Timer

    rng = np.random.default_rng(11)
    n_loc = 17
    pts = rng.uniform(0, 100, (n_loc, 2))
    cost = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    n_orders = 16
    dm = DataModel(n_loc, 4, n_orders=n_orders)
    dm.add_cost_matrix(cost)
    dm.add_transit_time_matrix(cost)
    dm.set_order_locations(list(range(1, n_orders + 1)))
    pick = list(range(0, n_orders, 2))
    drop = list(range(1, n_orders, 2))
    dm.set_pickup_delivery_pairs(pick, drop)
    prob = build_problem(dm)

    # deliberately bad assignment: pairs round-robined across vehicles
    routes = {v: [] for v in range(4)}
    for k, (p, d) in enumerate(zip(pick, drop)):
        routes[k % 4] += [p, d]
    for v, r in routes.items():
        assert prob.route_feasible(v, r)
    base = sum(prob.route_cost(v, r) for v, r in routes.items() if r)
    out, improved = _pdp_pair_improve(prob, routes, Timer(30.0))
    assert improved
    new = sum(prob.route_cost(v, r) for v, r in out.items() if r)
    assert new < base - 1e-6
    # pairs stay together, pickup first
    for v, r in out.items():
        for p, d in zip(pick, drop):
            if p in r:
                assert d in r and r.index(p) < r.index(d)


def test_max_cost_time_in_move_tensors():
    """With per-vehicle max cost/time scored as move-tensor dimensions,
    the device top-k must mostly SURVIVE the exact host recheck on a
    constrained instance (>50%; previously the evaluator proposed moves
    blind to these caps and the host discarded them), and the local
    search must still improve the solution without violating the caps."""
    import numpy as np

    from cuopt_tpu.io.vrp import synth_gh_instance
    from cuopt_tpu.routing.internal import build_problem
    from cuopt_tpu.routing.local_search import build_ls_problem
    from cuopt_tpu.routing.solver import _local_search
    from cuopt_tpu.routing.construction import cheapest_insertion
    from cuopt_tpu.utils.timer import Timer

    inst = synth_gh_instance(60, "R", seed=9)
    dm = inst.to_data_model()
    nf = len(dm.vehicle_types) if getattr(dm, "vehicle_types", None) \
        is not None else inst.n_vehicles
    dm.set_vehicle_max_costs(np.full(inst.n_vehicles, 300.0))
    dm.set_vehicle_max_times(np.full(inst.n_vehicles, 2000.0))
    prob = build_problem(dm)
    lsp = build_ls_problem(prob)
    routes, unassigned = cheapest_insertion(prob)
    base = sum(prob.route_cost(v, r) for v, r in routes.items() if r)
    out = _local_search(prob, lsp, routes, Timer(60.0), max_rounds=12)
    new = sum(prob.route_cost(v, r) for v, r in out.items() if r)
    assert new <= base + 1e-6
    for v, r in out.items():
        if r:
            assert prob.route_feasible(v, r)
    stats = getattr(prob, "_ls_recheck_stats", None)
    assert stats and stats[0] > 0, "no device proposals were rechecked"
    survival = stats[1] / stats[0]
    assert survival > 0.5, f"survival {survival:.2f} ({stats})"
