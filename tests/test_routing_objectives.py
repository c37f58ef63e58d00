"""Objective-function weights + order precedence (reference
data_model_view.hpp set_objective_function / add_order_precedence:359-368,
vehicle_routing.py:421 default weights)."""

import numpy as np
import pytest

from cuopt_tpu.routing import DataModel, Objective, Solve, SolverSettings
from cuopt_tpu.utils.errors import ValidationError


def _two_metric_instance():
    """4 customers; the COST matrix prefers path A, the TIME matrix
    prefers path B — so the optimized route depends on the weights."""
    n = 5  # 0 = depot
    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 100, (n, 2))
    dist = np.sqrt(((xy[:, None] - xy[None, :]) ** 2).sum(-1))
    cost = dist.copy()
    time = dist.max() - dist  # adversarial: cheap arcs are slow
    np.fill_diagonal(time, 0.0)
    dm = DataModel(n, 1, n)
    dm.add_cost_matrix(cost)
    dm.add_transit_time_matrix(time)
    return dm, cost, time


def _route_locs(sol):
    df = sol.get_route()
    locs = [int(r.location) for r in df.itertuples()]
    return locs


def _arc_sum(mat, locs):
    return float(sum(mat[a, b] for a, b in zip(locs, locs[1:])))


def test_objective_weights_change_optimized_quantity():
    s = SolverSettings()
    s.time_limit = 5

    dm, cost, time = _two_metric_instance()
    dm.set_objective_function([Objective.COST], [1.0])
    sol_cost = Solve(dm, s)

    dm2, _, _ = _two_metric_instance()
    dm2.set_objective_function([Objective.TRAVEL_TIME], [1.0])
    sol_time = Solve(dm2, s)

    locs_c = _route_locs(sol_cost)
    locs_t = _route_locs(sol_time)
    # the cost-optimal tour must be at least as cheap in COST units, the
    # time-optimal tour at least as fast in TIME units — and on this
    # adversarial instance they are different tours
    assert _arc_sum(cost, locs_c) <= _arc_sum(cost, locs_t) + 1e-6
    assert _arc_sum(time, locs_t) <= _arc_sum(time, locs_c) + 1e-6
    assert _arc_sum(cost, locs_c) < _arc_sum(cost, locs_t) - 1e-6 or \
        _arc_sum(time, locs_t) < _arc_sum(time, locs_c) - 1e-6


def test_objective_values_reported_per_objective():
    dm, cost, time = _two_metric_instance()
    dm.set_objective_function(
        [Objective.COST, Objective.TRAVEL_TIME], [1.0, 0.5]
    )
    s = SolverSettings()
    s.time_limit = 5
    sol = Solve(dm, s)
    vals = sol.get_objective_values()
    assert Objective.COST in vals
    assert Objective.TRAVEL_TIME in vals
    locs = _route_locs(sol)
    np.testing.assert_allclose(
        vals[Objective.COST], _arc_sum(cost, locs), rtol=1e-6
    )


class TestPrecedence:
    def _instance(self):
        n = 6
        rng = np.random.default_rng(0)
        xy = rng.uniform(0, 50, (n, 2))
        dist = np.sqrt(((xy[:, None] - xy[None, :]) ** 2).sum(-1))
        dm = DataModel(n, 2, n)
        dm.add_cost_matrix(dist)
        return dm

    def test_precedence_enforced_in_solution(self):
        dm = self._instance()
        # order 5 must come after orders 1 and 2
        dm.add_order_precedence(5, [1, 2])
        s = SolverSettings()
        s.time_limit = 5
        sol = Solve(dm, s)
        df = sol.get_route()
        served = df[df["type"].isin(["Delivery", "Pickup"])]
        arr = {int(r.route): float(r.arrival_stamp)
               for r in served.itertuples()}
        assert 5 in arr and 1 in arr and 2 in arr
        assert arr[5] >= arr[1] - 1e-9
        assert arr[5] >= arr[2] - 1e-9

    def test_chain_precedence(self):
        dm = self._instance()
        dm.add_order_precedence(3, [2])
        dm.add_order_precedence(2, [1])
        s = SolverSettings()
        s.time_limit = 5
        sol = Solve(dm, s)
        df = sol.get_route()
        served = df[df["type"].isin(["Delivery", "Pickup"])]
        arr = {int(r.route): float(r.arrival_stamp)
               for r in served.itertuples()}
        assert arr[2] >= arr[1] - 1e-9
        assert arr[3] >= arr[2] - 1e-9

    def test_circular_precedence_rejected(self):
        dm = self._instance()
        dm.add_order_precedence(1, [2])
        dm.add_order_precedence(2, [1])
        with pytest.raises(ValidationError):
            dm.validate()

    def test_bad_ids_rejected(self):
        dm = self._instance()
        with pytest.raises(ValidationError):
            dm.add_order_precedence(99, [1])
        with pytest.raises(ValidationError):
            dm.add_order_precedence(1, [1])
