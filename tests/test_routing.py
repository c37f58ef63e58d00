"""Routing solver tests.

Mirrors the reference Python routing test areas
(python/cuopt/cuopt/tests/routing/: tsp, cvrp, cvrptw, pdp, validation,
error handling) on small deterministic instances where the optimum can be
brute-forced.
"""

import itertools

import numpy as np
import pytest

from cuopt_tpu.routing import (
    DataModel,
    SolutionStatus,
    SolverSettings,
    Solve,
)
from cuopt_tpu.utils.errors import ValidationError


def settings(t=3.0, seed=0):
    s = SolverSettings()
    s.set_time_limit(t)
    s.seed = seed
    return s


def brute_force_tsp(cost):
    n = len(cost)
    best = np.inf
    for perm in itertools.permutations(range(1, n)):
        tour = (0,) + perm + (0,)
        c = sum(cost[tour[i]][tour[i + 1]] for i in range(len(tour) - 1))
        best = min(best, c)
    return best


class TestTsp:
    def test_small_tsp_optimal(self):
        rng = np.random.default_rng(5)
        n = 7
        pts = rng.uniform(0, 100, (n, 2))
        cost = np.sqrt(
            ((pts[:, None] - pts[None]) ** 2).sum(-1)
        )
        dm = DataModel(n, 1)
        dm.add_cost_matrix(cost)
        sol = Solve(dm, settings(5.0))
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        assert sol.get_vehicle_count() == 1
        expected = brute_force_tsp(cost)
        assert sol.get_total_objective() <= expected * 1.02 + 1e-6

    def test_route_structure(self):
        cost = np.array(
            [[0, 1, 5, 2], [2, 0, 7, 4], [1, 5, 0, 9], [5, 6, 2, 0]],
            float,
        )
        dm = DataModel(4, 2)
        dm.add_cost_matrix(cost)
        sol = Solve(dm, settings())
        df = sol.get_route()
        assert set(df.columns) == {
            "route", "arrival_stamp", "truck_id", "location", "type"
        }
        # every non-depot location appears exactly once
        served = df[df["route"] != 0]["location"].tolist()
        assert sorted(served) == [1, 2, 3]


class TestCvrp:
    def test_capacity_forces_two_vehicles(self):
        # 4 orders of demand 2, vehicle capacity 4 -> needs 2 vehicles
        n = 5
        cost = np.ones((n, n)) - np.eye(n)
        dm = DataModel(n, 3)
        dm.add_cost_matrix(cost)
        dm.add_capacity_dimension(
            "weight", [0, 2, 2, 2, 2], [4, 4, 4]
        )
        sol = Solve(dm, settings())
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        assert sol.get_vehicle_count() >= 2
        df = sol.get_route()
        # per-vehicle load within capacity
        for v in set(df["truck_id"]):
            orders = df[(df["truck_id"] == v) & (df["route"] != 0)][
                "route"
            ]
            assert 2 * len(orders) <= 4

    def test_infeasible_capacity(self):
        n = 3
        cost = np.ones((n, n)) - np.eye(n)
        dm = DataModel(n, 1)
        dm.add_cost_matrix(cost)
        dm.add_capacity_dimension("w", [0, 5, 5], [4])
        sol = Solve(dm, settings(1.0))
        assert sol.get_status() == SolutionStatus.FAIL.value
        assert len(sol.get_infeasible_orders()) == 2


class TestCvrptw:
    def test_time_windows_respected(self):
        n = 5
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 10, (n, 2))
        cost = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        dm = DataModel(n, 2)
        dm.add_cost_matrix(cost)
        dm.add_transit_time_matrix(cost)
        early = [0, 0, 10, 0, 20]
        late = [1000, 15, 30, 100, 40]
        dm.set_order_time_windows(early, late)
        dm.set_order_service_times([0, 1, 1, 1, 1])
        sol = Solve(dm, settings(5.0))
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        df = sol.get_route()
        for _, row in df.iterrows():
            o = int(row["route"])
            if o != 0:
                assert row["arrival_stamp"] >= early[o] - 1e-6
                assert row["arrival_stamp"] <= late[o] + 1e-6

    def test_tight_windows_infeasible(self):
        n = 3
        cost = np.full((n, n), 100.0) - 100.0 * np.eye(n)
        dm = DataModel(n, 1)
        dm.add_cost_matrix(cost)
        dm.add_transit_time_matrix(cost)
        # both orders must be served before travel time allows
        dm.set_order_time_windows([0, 0, 0], [1000, 10, 10])
        sol = Solve(dm, settings(1.0))
        assert sol.get_status() == SolutionStatus.FAIL.value


class TestPdp:
    def test_pickup_before_delivery(self):
        n = 5
        rng = np.random.default_rng(4)
        pts = rng.uniform(0, 10, (n, 2))
        cost = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        dm = DataModel(n, 2, n_orders=4)
        dm.add_cost_matrix(cost)
        dm.set_order_locations([1, 2, 3, 4])
        dm.set_pickup_delivery_pairs([0, 2], [1, 3])
        sol = Solve(dm, settings())
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        df = sol.get_route()
        for v in set(df["truck_id"]):
            seq = df[df["truck_id"] == v]["route"].tolist()
            for p, d in ((0, 1), (2, 3)):
                if p in seq:
                    assert d in seq
                    assert seq.index(p) < seq.index(d)


class TestFleetConstraints:
    def test_vehicle_fixed_costs_minimize_fleet(self):
        n = 5
        cost = np.ones((n, n)) - np.eye(n)
        dm = DataModel(n, 4)
        dm.add_cost_matrix(cost)
        dm.set_vehicle_fixed_costs([100.0] * 4)
        sol = Solve(dm, settings())
        assert sol.get_vehicle_count() == 1

    def test_order_vehicle_match(self):
        n = 4
        cost = np.ones((n, n)) - np.eye(n)
        dm = DataModel(n, 2)
        dm.add_cost_matrix(cost)
        dm.add_order_vehicle_match(1, [1])
        dm.add_order_vehicle_match(2, [1])
        dm.add_order_vehicle_match(3, [1])
        sol = Solve(dm, settings())
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        df = sol.get_route()
        served = df[df["route"] != 0]
        assert set(served["truck_id"]) == {1}

    def test_vehicle_start_locations(self):
        n = 4
        cost = np.ones((n, n)) - np.eye(n)
        dm = DataModel(n, 1)
        dm.add_cost_matrix(cost)
        dm.set_vehicle_locations([2], [2])
        sol = Solve(dm, settings())
        df = sol.get_route()
        assert int(df.iloc[0]["location"]) == 2
        assert int(df.iloc[-1]["location"]) == 2


class TestValidationErrors:
    def test_no_cost_matrix(self):
        dm = DataModel(3, 1)
        sol = Solve(dm, settings(1.0))
        assert sol.get_status() == SolutionStatus.FAIL.value
        assert sol.get_error_status() == 1

    def test_bad_matrix_shape(self):
        dm = DataModel(3, 1)
        with pytest.raises(ValidationError):
            dm.add_cost_matrix(np.ones((2, 3)))

    def test_bad_order_location(self):
        dm = DataModel(3, 1, n_orders=2)
        with pytest.raises(ValidationError):
            dm.set_order_locations([1, 7])

    def test_bad_time_windows(self):
        dm = DataModel(3, 1)
        with pytest.raises(ValidationError):
            dm.set_order_time_windows([10, 10, 10], [0, 20, 20])


class TestBreaks:
    def test_break_dimension_schedules_break(self):
        # 3 locations in a line; one vehicle; a mandatory 5-unit break
        # in [10, 20]. Reference: add_break_dimension
        # (data_model_view.hpp:198).
        n = 3
        cost = np.array([[0, 5, 9], [5, 0, 5], [9, 5, 0]], float)
        dm = DataModel(n, 1)
        dm.add_cost_matrix(cost)
        dm.add_break_dimension([10.0], [20.0], [5.0])
        sol = Solve(dm, settings())
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        df = sol.get_route()
        brk = df[df["type"] == "Break"]
        assert len(brk) == 1
        start = float(brk.iloc[0]["arrival_stamp"])
        assert 10.0 - 1e-6 <= start <= 20.0 + 1e-6
        # break delays later arrivals: route end must include the 5 units
        assert float(df.iloc[-1]["arrival_stamp"]) >= 5.0

    def test_break_infeasible_window_fails_route(self):
        # break must start in [0, 1] but takes 100 units while the
        # vehicle time window closes at 50 -> no feasible schedule
        n = 3
        cost = np.array([[0, 5, 9], [5, 0, 5], [9, 5, 0]], float)
        dm = DataModel(n, 1)
        dm.add_cost_matrix(cost)
        dm.set_vehicle_time_windows([0.0], [50.0])
        dm.add_break_dimension([0.0], [1.0], [100.0])
        sol = Solve(dm, settings(1.0))
        assert sol.get_status() != SolutionStatus.SUCCESS.value

    def test_vehicle_break_with_locations(self):
        # break must be taken at location 3 (a pure break stop)
        n = 4
        cost = np.ones((n, n)) - np.eye(n)
        dm = DataModel(n, 1, n_orders=2)
        dm.add_cost_matrix(cost)
        dm.set_order_locations([1, 2])
        dm.add_vehicle_break(0, 0.0, 1.0, 2.0, locations=[3])
        sol = Solve(dm, settings())
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        df = sol.get_route()
        brk = df[df["type"] == "Break"]
        assert len(brk) == 1
        assert int(brk.iloc[0]["location"]) == 3


class TestMinVehicles:
    def test_min_vehicles_splits_routes(self):
        n = 5
        cost = np.ones((n, n)) - np.eye(n)
        dm = DataModel(n, 3, n_orders=4)
        dm.add_cost_matrix(cost)
        dm.set_order_locations([1, 2, 3, 4])
        dm.set_min_vehicles(2)
        sol = Solve(dm, settings())
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        assert sol.get_vehicle_count() >= 2


class TestInitialSolutions:
    def test_initial_solution_seed_used(self):
        n = 5
        cost = np.array([
            [0, 2, 4, 4, 3],
            [2, 0, 1, 6, 5],
            [4, 1, 0, 3, 4],
            [4, 6, 3, 0, 1],
            [3, 5, 4, 1, 0],
        ], float)
        dm = DataModel(n, 2, n_orders=4)
        dm.add_cost_matrix(cost)
        dm.set_order_locations([1, 2, 3, 4])
        # seed: vehicle 0 serves orders 0,1; vehicle 1 serves 2,3
        dm.add_initial_solutions(
            [0, 1],
            [0, 1, 2, 3],
            ["Delivery", "Delivery", "Delivery", "Delivery"],
            [0, 2, 4],
        )
        sol = Solve(dm, settings())
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        df = sol.get_route()
        served = sorted(
            df[~df["type"].isin(["Depot", "Break"])]["location"].tolist()
        )
        assert served == [1, 2, 3, 4]
