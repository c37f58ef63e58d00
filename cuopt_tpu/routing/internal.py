"""Internal routing problem arrays + route evaluation.

The TPU-facing counterpart of the reference problem/route state layer
(cpp/src/routing/problem/problem.cuh, route/route.cuh dimension templates
with forward/backward cumulative data). Host-side numpy here; the hot
move-evaluation tensors live in local_search.py as jitted JAX.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

INF = np.inf


@dataclass
class RoutingProblem:
    n_locations: int
    n_fleet: int
    # orders to actually serve (depot-orders excluded)
    serve_orders: np.ndarray  # original order ids
    order_loc: np.ndarray  # (n_serve,) location of each served order
    demand: np.ndarray  # (n_dims, n_serve)
    capacity: np.ndarray  # (n_dims, n_fleet)
    tw_early: np.ndarray  # (n_serve,)
    tw_late: np.ndarray
    service: np.ndarray  # (n_serve,)
    prizes: np.ndarray | None
    veh_type: np.ndarray  # (n_fleet,)
    veh_start: np.ndarray  # (n_fleet,) locations
    veh_return: np.ndarray
    veh_tw_early: np.ndarray
    veh_tw_late: np.ndarray
    veh_fixed_cost: np.ndarray
    veh_max_cost: np.ndarray
    veh_max_time: np.ndarray
    drop_return: np.ndarray  # (n_fleet,) bool
    skip_first: np.ndarray  # (n_fleet,) bool
    cost_mats: np.ndarray  # (n_types, L, L)
    time_mats: np.ndarray  # (n_types, L, L)
    type_index: dict  # vehicle_type value -> index into mats
    # pickup-delivery: for each served order, partner index (-1 if none),
    # +1 if pickup, -1 if delivery, 0 if unpaired
    pd_partner: np.ndarray = field(default=None)
    pd_sign: np.ndarray = field(default=None)
    allowed_vehicles: np.ndarray = field(default=None)  # (n_serve, F) bool

    @property
    def n_serve(self):
        return len(self.order_loc)

    def cost(self, vtype_idx, a, b):
        return self.cost_mats[vtype_idx, a, b]

    def route_cost(self, vehicle: int, route: list[int]) -> float:
        """Cost of one route (serve-order index list, no depots)."""
        ti = self.type_index[int(self.veh_type[vehicle])]
        if not route:
            return 0.0
        locs = self.order_loc[route]
        c = 0.0
        if not self.skip_first[vehicle]:
            c += self.cost_mats[ti, self.veh_start[vehicle], locs[0]]
        c += float(np.sum(self.cost_mats[ti, locs[:-1], locs[1:]]))
        if not self.drop_return[vehicle]:
            c += self.cost_mats[ti, locs[-1], self.veh_return[vehicle]]
        return c + float(self.veh_fixed_cost[vehicle])

    def route_schedule(self, vehicle: int, route: list[int]):
        """Arrival times; returns (arrivals, feasible)."""
        ti = self.type_index[int(self.veh_type[vehicle])]
        t = self.time_mats[ti]
        cur_loc = self.veh_start[vehicle]
        now = self.veh_tw_early[vehicle]
        arr = []
        ok = True
        for k, o in enumerate(route):
            lo = self.order_loc[o]
            travel = 0.0 if (k == 0 and self.skip_first[vehicle]) \
                else t[cur_loc, lo]
            a = max(now + travel, self.tw_early[o])
            if a > self.tw_late[o] + 1e-9:
                ok = False
            arr.append(a)
            now = a + self.service[o]
            cur_loc = lo
        if route and not self.drop_return[vehicle]:
            now = now + t[cur_loc, self.veh_return[vehicle]]
        if now > self.veh_tw_late[vehicle] + 1e-9:
            ok = False
        return np.asarray(arr), ok

    def route_feasible(self, vehicle: int, route: list[int]) -> bool:
        if not route:
            return True
        load = self.demand[:, route].sum(axis=1)
        if np.any(load > self.capacity[:, vehicle] + 1e-9):
            return False
        if self.allowed_vehicles is not None:
            if not np.all(self.allowed_vehicles[route, vehicle]):
                return False
        if self.pd_partner is not None:
            pos = {o: i for i, o in enumerate(route)}
            for i, o in enumerate(route):
                p = self.pd_partner[o]
                if p >= 0:
                    if p not in pos:
                        return False
                    if self.pd_sign[o] > 0 and pos[p] < i:
                        return False
        _, ok = self.route_schedule(vehicle, route)
        if not ok:
            return False
        if np.isfinite(self.veh_max_cost[vehicle]):
            if self.route_cost(vehicle, route) - self.veh_fixed_cost[
                vehicle
            ] > self.veh_max_cost[vehicle] + 1e-9:
                return False
        if np.isfinite(self.veh_max_time[vehicle]):
            arr, _ = self.route_schedule(vehicle, route)
            if len(arr):
                ti = self.type_index[int(self.veh_type[vehicle])]
                end = arr[-1] + self.service[route[-1]]
                if not self.drop_return[vehicle]:
                    end += self.time_mats[
                        ti, self.order_loc[route[-1]],
                        self.veh_return[vehicle],
                    ]
                start = self.veh_tw_early[vehicle]
                if end - start > self.veh_max_time[vehicle] + 1e-9:
                    return False
        return True

    def solution_cost(self, routes: dict[int, list[int]]) -> float:
        total = sum(
            self.route_cost(v, r) for v, r in routes.items() if r
        )
        if self.prizes is not None:
            served = set()
            for r in routes.values():
                served.update(r)
            unserved = set(range(self.n_serve)) - served
            total += float(sum(self.prizes[list(unserved)])) \
                if unserved else 0.0
        return total


def build_problem(dm) -> RoutingProblem:
    """DataModel -> RoutingProblem internal arrays."""
    L = dm.n_locations
    F = dm.n_fleet
    veh_type = dm.vehicle_types if dm.vehicle_types is not None \
        else np.zeros(F, np.int64)
    types = sorted(set(int(t) for t in veh_type))
    type_index = {t: i for i, t in enumerate(types)}
    cost_mats = np.stack([dm.cost_matrices[t] for t in types])
    if dm.transit_time_matrices:
        time_mats = np.stack([
            dm.transit_time_matrices.get(t, dm.cost_matrices[t])
            for t in types
        ])
    else:
        time_mats = cost_mats.copy()

    veh_start = dm.vehicle_start if dm.vehicle_start is not None \
        else np.zeros(F, np.int64)
    veh_return = dm.vehicle_return if dm.vehicle_return is not None \
        else veh_start.copy()

    if dm.order_locations is not None:
        order_loc_all = dm.order_locations
        serve = np.arange(dm.n_orders)
    else:
        order_loc_all = np.arange(dm.n_orders)
        depot_locs = set(veh_start.tolist()) | set(veh_return.tolist())
        serve = np.array(
            [o for o in range(dm.n_orders)
             if int(order_loc_all[o]) not in depot_locs],
            np.int64,
        )
    ns = len(serve)
    order_loc = order_loc_all[serve]

    if dm.capacity_dimensions:
        demand = np.stack(
            [d[serve] for d, _ in dm.capacity_dimensions.values()]
        )
        capacity = np.stack(
            [c for _, c in dm.capacity_dimensions.values()]
        )
    else:
        demand = np.zeros((1, ns))
        capacity = np.full((1, F), INF)

    if dm.order_tw is not None:
        tw_early = dm.order_tw[0][serve]
        tw_late = dm.order_tw[1][serve]
    else:
        tw_early = np.zeros(ns)
        tw_late = np.full(ns, INF)
    service = dm.order_service_times.get(-1)
    service = service[serve] if service is not None else np.zeros(ns)

    if dm.vehicle_tw is not None:
        veh_tw_early, veh_tw_late = dm.vehicle_tw
    else:
        veh_tw_early = np.zeros(F)
        veh_tw_late = np.full(F, INF)

    pd_partner = None
    pd_sign = None
    if dm.pickup_indices is not None:
        orig_to_serve = {int(o): i for i, o in enumerate(serve)}
        pd_partner = np.full(ns, -1, np.int64)
        pd_sign = np.zeros(ns, np.int64)
        for p, d in zip(dm.pickup_indices, dm.delivery_indices):
            pi = orig_to_serve.get(int(p))
            di = orig_to_serve.get(int(d))
            if pi is not None and di is not None:
                pd_partner[pi] = di
                pd_partner[di] = pi
                pd_sign[pi] = 1
                pd_sign[di] = -1

    allowed = None
    if dm.vehicle_order_match or dm.order_vehicle_match:
        allowed = np.ones((ns, F), bool)
        orig_to_serve = {int(o): i for i, o in enumerate(serve)}
        if dm.order_vehicle_match:
            for o, vehs in dm.order_vehicle_match.items():
                i = orig_to_serve.get(int(o))
                if i is not None:
                    allowed[i, :] = False
                    allowed[i, vehs] = True
        if dm.vehicle_order_match:
            restricted = np.zeros(F, bool)
            ok_orders = {v: set(orders.tolist())
                         for v, orders in dm.vehicle_order_match.items()}
            for v, orders in ok_orders.items():
                restricted[v] = True
                for o in range(ns):
                    if int(serve[o]) not in orders:
                        allowed[o, v] = False

    return RoutingProblem(
        n_locations=L, n_fleet=F,
        serve_orders=serve, order_loc=order_loc,
        demand=demand, capacity=capacity,
        tw_early=tw_early, tw_late=tw_late, service=service,
        prizes=None if dm.order_prizes is None
        else dm.order_prizes[serve],
        veh_type=veh_type, veh_start=veh_start, veh_return=veh_return,
        veh_tw_early=veh_tw_early, veh_tw_late=veh_tw_late,
        veh_fixed_cost=dm.vehicle_fixed_costs
        if dm.vehicle_fixed_costs is not None else np.zeros(F),
        veh_max_cost=dm.vehicle_max_costs
        if dm.vehicle_max_costs is not None else np.full(F, INF),
        veh_max_time=dm.vehicle_max_times
        if dm.vehicle_max_times is not None else np.full(F, INF),
        drop_return=dm.drop_return_trips
        if dm.drop_return_trips is not None else np.zeros(F, bool),
        skip_first=dm.skip_first_trips
        if dm.skip_first_trips is not None else np.zeros(F, bool),
        cost_mats=cost_mats, time_mats=time_mats, type_index=type_index,
        pd_partner=pd_partner, pd_sign=pd_sign,
        allowed_vehicles=allowed,
    )
