"""EAX recombiner + exchange-cycle move family
(reference crossovers/eax_recombiner.hpp, ab_cycle.hpp;
local_search/cycle_finder/cycle_finder.cu)."""

import numpy as np

from cuopt_tpu.io.vrp import synth_gh_instance
from cuopt_tpu.routing.cycle_finder import (
    apply_exchange_cycle,
    cycle_search,
    find_negative_cycle,
)
from cuopt_tpu.routing.eax import _ab_cycles, _edges, eax, eax_applicable
from cuopt_tpu.routing.internal import build_problem
from cuopt_tpu.routing.local_search import build_ls_problem


def _problem(n=40, seed=2):
    inst = synth_gh_instance(n, "C", seed=seed, tw_frac=0.0)
    dm = inst.to_data_model()
    return build_problem(dm)


def _two_solutions(prob, seed=0):
    from cuopt_tpu.routing.construction import cheapest_insertion

    rng = np.random.default_rng(seed)
    r1, u1 = cheapest_insertion(prob)
    r2, u2 = cheapest_insertion(prob, rng=rng, noise=0.6)
    return ({"routes": r1, "unassigned": u1},
            {"routes": r2, "unassigned": u2})


def test_ab_cycles_alternate_and_cover():
    prob = _problem()
    pa, pb = _two_solutions(prob)
    ea, eb = _edges(pa["routes"]), _edges(pb["routes"])
    rng = np.random.default_rng(0)
    cycles = _ab_cycles(ea, eb, rng)
    if not cycles:  # identical parents: nothing to assert
        return
    for cyc in cycles:
        # edges strictly alternate between the parents
        kinds = [from_a for _, from_a in cyc]
        for a, b in zip(kinds[:-1], kinds[1:]):
            assert a != b
        assert len(cyc) % 2 == 0


def test_eax_child_serves_everything():
    prob = _problem()
    assert eax_applicable(prob)
    pa, pb = _two_solutions(prob)
    rng = np.random.default_rng(1)
    out = eax(prob, pa, pb, rng)
    if out is None:
        return  # degenerate parents
    routes, unassigned = out
    served = sorted(
        [o for r in routes.values() for o in r] + list(unassigned)
    )
    assert served == list(range(prob.n_serve))
    assert len(set(served)) == prob.n_serve
    for v, r in routes.items():
        if r:
            assert prob.route_feasible(v, r)


def test_negative_cycle_detection():
    BIG = 1e11
    G = np.full((4, 4), BIG)
    # cycle 0 -> 1 -> 2 -> 0 with total -1
    G[0, 1] = 2.0
    G[1, 2] = -1.5
    G[2, 0] = -1.5
    G[1, 0] = 5.0
    cyc = find_negative_cycle(G)
    assert cyc is not None
    assert cyc[0] == cyc[-1]
    assert set(cyc) <= {0, 1, 2}
    # no negative cycle -> None
    G2 = np.full((3, 3), BIG)
    G2[0, 1] = 1.0
    G2[1, 0] = 1.0
    assert find_negative_cycle(G2) is None


def test_cycle_search_improves_contrived():
    """Three routes where each order belongs in the NEXT route's cluster:
    only a 3-cycle fixes it (no single pairwise relocate both ways)."""
    from cuopt_tpu.routing.data_model import DataModel
    from cuopt_tpu.routing.settings import SolverSettings  # noqa: F401

    # clusters at (0,0), (10,0), (20,0); depot at (5, 5)
    pts = [(5.0, 5.0)]
    clusters = [(0.0, 0.0), (10.0, 0.0), (20.0, 0.0)]
    for cx, cy in clusters:
        for k in range(3):
            pts.append((cx + 0.1 * k, cy))
    xy = np.asarray(pts)
    dist = np.sqrt(((xy[:, None] - xy[None, :]) ** 2).sum(-1))
    n_orders = 9
    dm = DataModel(len(pts), 3, n_orders)
    dm.add_cost_matrix(dist)
    dm.set_order_locations(np.arange(1, 10, dtype=np.int32))
    # capacity 3 per vehicle, demand 1 per order
    dm.add_capacity_dimension("d", np.ones(n_orders), np.full(3, 3.0))
    prob = build_problem(dm)
    lsp = build_ls_problem(prob)
    # rotate one order of each cluster into the wrong route
    routes = {
        0: [0, 1, 5],   # orders 0-2 are cluster A (locs 1-3); 5 in B
        1: [3, 4, 8],   # 8 belongs to cluster C
        2: [6, 7, 2],   # 2 belongs to cluster A
    }
    base = sum(prob.route_cost(v, r) for v, r in routes.items())
    new_routes, improved = cycle_search(prob, lsp, routes)
    new = sum(prob.route_cost(v, r) for v, r in new_routes.items())
    assert improved
    assert new < base - 1e-6
    # capacity still respected
    for v, r in new_routes.items():
        assert len(r) <= 3


def test_hvrp_reassign_moves_route_to_cheaper_vehicle():
    """HVRP regret reassignment (reference local_search/hvrp): a route
    on an expensive vehicle type moves to a cheaper idle one."""
    import numpy as np

    from cuopt_tpu.routing.cycle_finder import hvrp_reassign
    from cuopt_tpu.routing.data_model import DataModel
    from cuopt_tpu.routing.internal import build_problem
    from cuopt_tpu.routing.local_search import build_ls_problem

    xy = np.asarray([(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0)])
    dist = np.sqrt(((xy[:, None] - xy[None, :]) ** 2).sum(-1))
    dm = DataModel(4, 2, 3)
    dm.add_cost_matrix(dist * 3.0, vehicle_type=0)   # expensive type
    dm.add_cost_matrix(dist, vehicle_type=1)          # cheap type
    dm.set_vehicle_types(np.array([0, 1], np.int32))
    dm.set_order_locations(np.array([1, 2, 3], np.int32))
    prob = build_problem(dm)
    lsp = build_ls_problem(prob)
    routes = {0: [0, 1, 2], 1: []}   # everything on the expensive one
    new_routes, improved = hvrp_reassign(prob, lsp, routes)
    assert improved
    assert new_routes[1] == [0, 1, 2] and new_routes[0] == []


def test_set_covering_child_covers_all():
    """Set-covering route selection (reference crossovers/
    set_covering.hpp): child from pooled member routes serves every
    order exactly once."""
    prob = _problem(n=30, seed=4)
    members = []
    for seed in (0, 1, 2):
        from cuopt_tpu.routing.construction import cheapest_insertion

        rng = np.random.default_rng(seed)
        r, u = cheapest_insertion(prob, rng=rng, noise=0.4 * seed)
        members.append({"routes": r, "unassigned": u})
    from cuopt_tpu.routing.diversity import set_covering_child

    out = set_covering_child(prob, members, np.random.default_rng(9))
    assert out is not None
    routes, unassigned = out
    served = sorted(
        [o for r in routes.values() for o in r] + list(unassigned)
    )
    assert served == list(range(prob.n_serve))
    for v, r in routes.items():
        if r:
            assert prob.route_feasible(v, r)
