"""Routing Assignment result object.

Mirrors reference cuopt.routing.Assignment
(python/cuopt/cuopt/routing/assignment.py:28: vehicle_count, objective
values, route dataframe with route/arrival_stamp/truck_id/location,
status SUCCESS/FAIL/TIMEOUT/EMPTY, infeasible orders) with pandas instead
of cudf.
"""

from __future__ import annotations

from enum import Enum, IntEnum


class SolutionStatus(Enum):
    SUCCESS = 0
    FAIL = 1
    TIMEOUT = 2
    EMPTY = 3


class Objective(IntEnum):
    COST = 0
    TRAVEL_TIME = 1
    VARIANCE_ROUTE_SIZE = 2
    VARIANCE_ROUTE_SERVICE_TIME = 3
    PRIZE = 4
    VEHICLE_FIXED_COST = 5


class Assignment:
    def __init__(
        self,
        vehicle_count,
        total_objective_value,
        objective_values,
        route_df,
        accepted=None,
        status=SolutionStatus.SUCCESS.value,
        message="",
        error_status=0,
        error_message="",
        undeliverable_orders=None,
    ):
        self.vehicle_count = vehicle_count
        self.total_objective_value = total_objective_value
        self.objective_values = objective_values
        self.route = route_df
        self.accepted = accepted if accepted is not None else []
        self.status = status
        self.message = message
        self.error_status = error_status
        self.error_message = error_message
        self.undeliverable_orders = (
            undeliverable_orders if undeliverable_orders is not None else []
        )

    def get_vehicle_count(self):
        return self.vehicle_count

    def get_total_objective(self):
        return self.total_objective_value

    def get_objective_values(self):
        return self.objective_values

    def get_route(self):
        return self.route

    def get_status(self):
        return self.status

    def get_message(self):
        return self.message

    def get_error_status(self):
        return self.error_status

    def get_error_message(self):
        return self.error_message

    def get_infeasible_orders(self):
        return self.undeliverable_orders

    def get_accepted_solutions(self):
        return self.accepted

    def display_routes(self):
        df = self.route
        for truck in sorted(set(df["truck_id"])):
            sub = df[df["truck_id"] == truck]
            path = "->".join(str(int(r)) for r in sub["route"])
            print(f"Vehicle-{truck} starts at: {sub.iloc[0]['arrival_stamp']}"
                  f", route: {path}")
