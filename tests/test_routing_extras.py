"""Generator + re-routing tests (reference: cpp/src/routing/generator/,
python/cuopt/cuopt/routing/re_routing.py and its test
python/cuopt/cuopt/tests/routing/test_re_routing.py)."""

import numpy as np

from cuopt_tpu.routing import (
    DataModel,
    DatasetParams,
    SolutionStatus,
    Solve,
    SolverSettings,
    construct_rerouting_model,
    generate_dataset,
)


def settings(t=3.0):
    s = SolverSettings()
    s.set_time_limit(t)
    return s


class TestGenerator:
    def test_generated_instance_solves(self):
        params = DatasetParams(
            n_locations=20, fleet_size=4, tw_tightness=0.3, seed=3,
        )
        dm = generate_dataset(params)
        sol = Solve(dm, settings(5.0))
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        df = sol.get_route()
        served = df[~df["type"].isin(["Depot", "Break"])]["route"]
        assert len(set(served)) == 19  # all non-depot orders

    def test_generator_pdp(self):
        params = DatasetParams(
            n_locations=11, fleet_size=3, pickup_delivery=True, seed=4,
        )
        dm = generate_dataset(params)
        assert dm.pickup_indices is not None
        sol = Solve(dm, settings(5.0))
        assert sol.get_status() == SolutionStatus.SUCCESS.value

    def test_generator_clustered_vs_random(self):
        a = generate_dataset(DatasetParams(
            n_locations=30, distrib="clustered", seed=1, fleet_size=3,
        ))
        b = generate_dataset(DatasetParams(
            n_locations=30, distrib="random", seed=1, fleet_size=3,
        ))
        assert not np.allclose(a.get_cost_matrix(), b.get_cost_matrix())

    def test_generator_breaks_and_types(self):
        dm = generate_dataset(DatasetParams(
            n_locations=15, fleet_size=3, break_dim=1,
            n_vehicle_types=2, n_matrix_types=2, tw_tightness=0.2, seed=9,
        ))
        assert len(dm.break_dimensions) == 1
        assert len(dm.cost_matrices) == 2


class TestReRouting:
    def _base_model(self):
        # locations 0..5; depot 0; 2 PDP pairs: (1->2), (3->4)
        n = 6
        cost = np.abs(
            np.arange(n)[:, None] - np.arange(n)[None]
        ).astype(float) * 2.0
        dm = DataModel(n, 2, n_orders=4)
        dm.add_cost_matrix(cost)
        dm.add_transit_time_matrix(cost)
        dm.set_order_locations([1, 2, 3, 4])
        dm.set_order_time_windows([0, 0, 0, 0], [1000] * 4)
        dm.set_order_service_times([1, 1, 1, 1])
        dm.add_capacity_dimension("demand", [2, -2, 3, -3], [10, 10])
        dm.set_pickup_delivery_pairs([0, 2], [1, 3])
        dm.set_vehicle_time_windows([0, 0], [10000, 10000])
        return dm

    def test_rerouting_drops_fulfilled_orders(self):
        dm = self._base_model()
        sol = Solve(dm, settings())
        assert sol.get_status() == SolutionStatus.SUCCESS.value
        df = sol.get_route()
        # pick a reroute time after everything finished: all orders done
        t_end = float(df["arrival_stamp"].max()) + 10
        new_dm, order_map = construct_rerouting_model(
            dm, df, t_end, None
        )
        # no residual orders
        assert all(isinstance(v, tuple) or v in () for v in
                   order_map.values()) or len(order_map) == 0

    def test_rerouting_preserves_uninitiated_and_new(self):
        dm = self._base_model()
        sol = Solve(dm, settings())
        df = sol.get_route()
        new_orders = dict(
            order_locations=[5, 1],
            earliest_time=[0, 0],
            latest_time=[2000, 2000],
            service_time=[1, 1],
            pickup_indices=[0],
            delivery_indices=[1],
            demand=[2, -2],
        )
        new_dm, order_map = construct_rerouting_model(
            dm, df, 0.5, new_orders
        )
        # nothing done by t=0.5 except possibly first arrivals; the new
        # model must include the new pair and solve
        sol2 = Solve(new_dm, settings())
        assert sol2.get_status() == SolutionStatus.SUCCESS.value

    def test_rerouting_partial_creates_dummy_pickup(self):
        dm = self._base_model()
        sol = Solve(dm, settings())
        df = sol.get_route()
        orders = df[~df["type"].isin(["Depot", "Break"])].sort_values(
            "arrival_stamp"
        )
        # choose a time right after the first pickup is served
        first_pick = orders[orders["route"].isin([0, 2])].iloc[0]
        t = float(first_pick["arrival_stamp"]) + 1.0 + 1e-6
        new_dm, order_map = construct_rerouting_model(dm, df, t, None)
        tags = list(order_map.values())
        assert any(isinstance(x, tuple) and x[0] == "dummy" for x in tags)
        sol2 = Solve(new_dm, settings())
        assert sol2.get_status() == SolutionStatus.SUCCESS.value


def test_exact_break_placement_beats_greedy():
    """Exact break scheduling (reference node/break_node.cuh treats
    breaks as positioned route nodes): a break that must be taken EARLY
    (before the first customer) is infeasible under pure take-late
    greedy but feasible by position enumeration."""
    import numpy as np

    from cuopt_tpu.routing.data_model import DataModel
    from cuopt_tpu.routing.internal import build_problem

    # depot at 0, customer at 1; travel 10 each way
    n = 2
    mat = np.array([[0.0, 10.0], [10.0, 0.0]])
    dm = DataModel(n, 1, 1)
    dm.add_cost_matrix(mat)
    dm.add_transit_time_matrix(mat)
    dm.set_order_locations(np.array([1], np.int32))
    # customer window forces arrival in [30, 40]; service 5
    dm.set_order_time_windows(np.array([30.0]), np.array([40.0]))
    dm.set_order_service_times(np.array([5.0]))
    dm.set_vehicle_time_windows(np.array([0.0]), np.array([200.0]))
    # break must START within [0, 12] (duration 5): it can only be taken
    # BEFORE driving to the customer. The take-late greedy postpones it
    # past the first leg (depart 35+, too late) and fails.
    dm.add_vehicle_break(0, earliest=0.0, latest=12.0, duration=5.0)
    prob = build_problem(dm)
    plan = prob.route_plan(0, [0])
    assert plan["time_ok"], plan
    assert len(plan["breaks"]) == 1
    assert plan["breaks"][0]["start"] <= 12.0 + 1e-9
    assert prob.route_feasible(0, [0])
