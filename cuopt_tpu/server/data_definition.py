"""Request/response schemas for the solver service.

Mirrors the reference pydantic StrictModels:
  LP:      python/cuopt_server/cuopt_server/utils/linear_programming/
           data_definition.py:106-680 (CSRConstraintMatrix, ObjectiveData,
           Constraint/VariableBounds, Tolerances, SolverConfig, LPData)
  routing: python/cuopt_server/cuopt_server/utils/routing/
           data_definition.py:38-943 (CostMatrices, FleetData, TaskData,
           SolverSettingsConfig, OptimizedRoutingData)

'inf'/'ninf' string sentinels in bounds arrays are accepted like the
reference.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

from pydantic import BaseModel, ConfigDict, Field, model_validator


def parse_bound_list(vals):
    if vals is None:
        return None
    out = []
    for v in vals:
        if isinstance(v, str):
            s = v.lower()
            if s in ("inf", "+inf", "infinity"):
                out.append(math.inf)
            elif s in ("ninf", "-inf", "-infinity"):
                out.append(-math.inf)
            else:
                out.append(float(v))
        else:
            out.append(float(v))
    return out


class StrictModel(BaseModel):
    model_config = ConfigDict(extra="forbid")


# ----------------------------------------------------------------- LP
class CSRConstraintMatrix(StrictModel):
    offsets: List[int] = Field(default=[0])
    indices: List[int] = Field(default=[])
    values: List[float] = Field(default=[])

    @model_validator(mode="after")
    def _check_csr(self):
        o = self.offsets
        if not o or o[0] != 0:
            raise ValueError("offsets must start at 0")
        if any(b < a for a, b in zip(o, o[1:])):
            raise ValueError("offsets must be non-decreasing")
        if len(self.indices) != len(self.values):
            raise ValueError("indices/values length mismatch")
        if o[-1] != len(self.values):
            raise ValueError(
                "offsets[-1] must equal the number of nonzeros"
            )
        if any(i < 0 for i in self.indices):
            raise ValueError("negative column index")
        return self


class ObjectiveData(StrictModel):
    coefficients: List[float] = Field(default=[])
    scalability_factor: Optional[float] = None
    offset: Optional[float] = 0.0


class ConstraintBounds(StrictModel):
    upper_bounds: Optional[list] = None
    lower_bounds: Optional[list] = None
    bounds: Optional[List[float]] = None
    types: Optional[List[str]] = None


class VariableBounds(StrictModel):
    upper_bounds: Optional[list] = None
    lower_bounds: Optional[list] = None


class InitialSolution(StrictModel):
    primal: Optional[List[float]] = None
    dual: Optional[List[float]] = None


class Tolerances(StrictModel):
    optimality: Optional[float] = None
    absolute_primal: Optional[float] = None
    absolute_dual: Optional[float] = None
    absolute_gap: Optional[float] = None
    relative_primal: Optional[float] = None
    relative_dual: Optional[float] = None
    relative_gap: Optional[float] = None
    primal_infeasible: Optional[float] = None
    dual_infeasible: Optional[float] = None
    mip_integrality_tolerance: Optional[float] = None
    mip_absolute_gap: Optional[float] = None
    mip_relative_gap: Optional[float] = None


class SolverConfig(StrictModel):
    tolerances: Optional[Tolerances] = None
    infeasibility_detection: Optional[bool] = None
    time_limit: Optional[float] = None
    iteration_limit: Optional[int] = None
    pdlp_solver_mode: Optional[int] = None
    method: Optional[int] = None
    mip_scaling: Optional[bool] = None
    mip_heuristics_only: Optional[bool] = None
    num_cpu_threads: Optional[int] = None
    crossover: Optional[bool] = None
    log_to_console: Optional[bool] = None
    solution_file: Optional[str] = None
    user_problem_file: Optional[str] = None


class LPData(StrictModel):
    """Validated LP payload; cross-field shape checks mirror the
    reference's strict models (utils/linear_programming/
    data_definition.py:106-680)."""

    csr_constraint_matrix: CSRConstraintMatrix = Field(
        default=CSRConstraintMatrix()
    )
    objective_data: Optional[ObjectiveData] = Field(default=ObjectiveData())
    constraint_bounds: Optional[ConstraintBounds] = Field(
        default=ConstraintBounds()
    )
    variable_bounds: Optional[VariableBounds] = Field(
        default=VariableBounds()
    )
    initial_solution: Optional[InitialSolution] = None
    maximize: Optional[bool] = False
    variable_types: Optional[List[str]] = None
    variable_names: Optional[List[str]] = None
    solver_config: Optional[SolverConfig] = Field(default=SolverConfig())
    # full PDLP internal state from a prior solve (reference
    # data_definition.py WarmStartData; GET /cuopt/solution/{id}/warmstart)
    warm_start_data: Optional[dict] = None

    @model_validator(mode="after")
    def _check_shapes(self):
        n_rows = len(self.csr_constraint_matrix.offsets) - 1
        n_vars = None
        if self.objective_data and self.objective_data.coefficients:
            n_vars = len(self.objective_data.coefficients)
        if self.csr_constraint_matrix.indices and n_vars is not None:
            if max(self.csr_constraint_matrix.indices) >= n_vars:
                raise ValueError("column index out of range")
        vb = self.variable_bounds
        if vb is not None and n_vars is not None:
            for name, b in (("variable lower", vb.lower_bounds),
                            ("variable upper", vb.upper_bounds)):
                if b is not None and len(b) != n_vars:
                    raise ValueError(
                        f"{name} bounds length {len(b)} != num "
                        f"variables {n_vars}"
                    )
        cb = self.constraint_bounds
        if cb is not None:
            for name, b in (("constraint lower", cb.lower_bounds),
                            ("constraint upper", cb.upper_bounds),
                            ("constraint rhs", cb.bounds)):
                if b is not None and len(b) != n_rows:
                    raise ValueError(
                        f"{name} bounds length {len(b)} != num "
                        f"constraints {n_rows}"
                    )
            if cb.types is not None:
                if len(cb.types) != n_rows:
                    raise ValueError("constraint types length mismatch")
                bad = set(cb.types) - {"L", "G", "E"}
                if bad:
                    raise ValueError(f"invalid constraint sense {bad}")
        if self.variable_types is not None:
            if n_vars is not None and len(self.variable_types) != n_vars:
                raise ValueError("variable_types length mismatch")
            bad = set(self.variable_types) - {"C", "I"}
            if bad:
                raise ValueError(f"invalid variable type {bad}")
        return self


class LPTupleData(StrictModel):
    data_list: List[Tuple[str, bytes]] = Field(default=[])


# ------------------------------------------------------------- routing
class RoutingObjective(StrictModel):
    cost: Optional[float] = 1.0
    travel_time: Optional[float] = 0.0
    variance_route_size: Optional[float] = 0.0
    variance_route_service_time: Optional[float] = 0.0
    prize: Optional[float] = 0.0
    vehicle_fixed_cost: Optional[float] = 0.0


class CostMatrices(StrictModel):
    data: Optional[Dict[int, List[List[float]]]] = None


class VehicleBreak(StrictModel):
    vehicle_id: int
    earliest: float
    latest: float
    duration: float
    locations: Optional[List[int]] = None

    @model_validator(mode="after")
    def _check(self):
        if self.vehicle_id < 0:
            raise ValueError("vehicle_id must be non-negative")
        if self.latest < self.earliest:
            raise ValueError("break latest < earliest")
        if self.duration < 0:
            raise ValueError("negative break duration")
        return self


class FleetData(StrictModel):
    vehicle_locations: List[List[int]] = Field(...)
    vehicle_ids: Optional[List[str]] = None
    capacities: Optional[List[List[int]]] = None
    vehicle_time_windows: Optional[List[List[float]]] = None
    vehicle_break_time_windows: Optional[List[List[List[float]]]] = None
    vehicle_break_durations: Optional[List[List[float]]] = None
    vehicle_break_locations: Optional[List[int]] = None
    vehicle_breaks: Optional[List[VehicleBreak]] = None
    vehicle_types: Optional[List[int]] = None
    vehicle_order_match: Optional[List[dict]] = None
    skip_first_trips: Optional[List[bool]] = None
    drop_return_trips: Optional[List[bool]] = None
    min_vehicles: Optional[int] = None
    vehicle_max_costs: Optional[List[float]] = None
    vehicle_max_times: Optional[List[float]] = None
    vehicle_fixed_costs: Optional[List[float]] = None

    @model_validator(mode="after")
    def _check_fleet(self):
        nf = len(self.vehicle_locations)
        if nf == 0:
            raise ValueError("fleet must have at least one vehicle")
        for vl in self.vehicle_locations:
            if len(vl) != 2:
                raise ValueError(
                    "vehicle_locations entries must be [start, return]"
                )
            if any(x < 0 for x in vl):
                raise ValueError("negative vehicle location")
        for name, per_vehicle in (
            ("vehicle_time_windows", self.vehicle_time_windows),
            ("skip_first_trips", self.skip_first_trips),
            ("drop_return_trips", self.drop_return_trips),
            ("vehicle_max_costs", self.vehicle_max_costs),
            ("vehicle_max_times", self.vehicle_max_times),
            ("vehicle_fixed_costs", self.vehicle_fixed_costs),
            ("vehicle_types", self.vehicle_types),
        ):
            if per_vehicle is not None and len(per_vehicle) != nf:
                raise ValueError(f"{name} length != fleet size")
        if self.vehicle_time_windows is not None:
            for tw in self.vehicle_time_windows:
                if len(tw) != 2 or tw[1] < tw[0]:
                    raise ValueError("invalid vehicle time window")
        if self.capacities is not None:
            for dim in self.capacities:
                if len(dim) != nf:
                    raise ValueError("capacity row length != fleet size")
        return self


class TaskData(StrictModel):
    task_locations: List[int] = Field(...)
    task_ids: Optional[List[str]] = None
    demand: Optional[List[List[int]]] = None
    pickup_and_delivery_pairs: Optional[List[List[int]]] = None
    task_time_windows: Optional[List[List[int]]] = None
    service_times: Optional[List[int]] = None
    prizes: Optional[List[float]] = None
    order_vehicle_match: Optional[List[dict]] = None

    @model_validator(mode="after")
    def _check_tasks(self):
        nt = len(self.task_locations)
        if nt == 0:
            raise ValueError("task_locations must be non-empty")
        if any(t < 0 for t in self.task_locations):
            raise ValueError("negative task location")
        for name, per_task in (
            ("task_time_windows", self.task_time_windows),
            ("service_times", self.service_times),
            ("prizes", self.prizes),
        ):
            if per_task is not None and len(per_task) != nt:
                raise ValueError(f"{name} length != number of tasks")
        if self.task_time_windows is not None:
            for tw in self.task_time_windows:
                if len(tw) != 2 or tw[1] < tw[0]:
                    raise ValueError("invalid task time window")
        if self.demand is not None:
            for dim in self.demand:
                if len(dim) != nt:
                    raise ValueError("demand row length != tasks")
        if self.pickup_and_delivery_pairs is not None:
            for pr in self.pickup_and_delivery_pairs:
                if len(pr) != 2 or pr[0] == pr[1] or \
                        any(x < 0 or x >= nt for x in pr):
                    raise ValueError("invalid pickup/delivery pair")
        return self


class SolverSettingsConfig(StrictModel):
    time_limit: Optional[float] = None
    objectives: Optional[RoutingObjective] = None
    config_file: Optional[str] = None
    verbose_mode: Optional[bool] = None
    error_logging: Optional[bool] = None


class OptimizedRoutingData(StrictModel):
    cost_waypoint_graph_data: Optional[dict] = None
    travel_time_waypoint_graph_data: Optional[dict] = None
    cost_matrix_data: Optional[CostMatrices] = None
    travel_time_matrix_data: Optional[CostMatrices] = None
    fleet_data: FleetData
    task_data: TaskData
    solver_config: Optional[SolverSettingsConfig] = None
    initial_solution: Optional[list] = None
