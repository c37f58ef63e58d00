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

from pydantic import BaseModel, ConfigDict, Field


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


class TaskData(StrictModel):
    task_locations: List[int] = Field(...)
    task_ids: Optional[List[str]] = None
    demand: Optional[List[List[int]]] = None
    pickup_and_delivery_pairs: Optional[List[List[int]]] = None
    task_time_windows: Optional[List[List[int]]] = None
    service_times: Optional[List[int]] = None
    prizes: Optional[List[float]] = None
    order_vehicle_match: Optional[List[dict]] = None


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
