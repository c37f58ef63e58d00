"""Public constants, mirroring reference
cpp/include/cuopt/linear_programming/constants.h:33-105 (parameter names,
termination statuses, senses, variable types, status codes).
"""

import math

# --- LP/MIP parameter string constants (constants.h:33-62) ---
CUOPT_ABSOLUTE_DUAL_TOLERANCE = "absolute_dual_tolerance"
CUOPT_RELATIVE_DUAL_TOLERANCE = "relative_dual_tolerance"
CUOPT_ABSOLUTE_PRIMAL_TOLERANCE = "absolute_primal_tolerance"
CUOPT_RELATIVE_PRIMAL_TOLERANCE = "relative_primal_tolerance"
CUOPT_ABSOLUTE_GAP_TOLERANCE = "absolute_gap_tolerance"
CUOPT_RELATIVE_GAP_TOLERANCE = "relative_gap_tolerance"
CUOPT_INFEASIBILITY_DETECTION = "infeasibility_detection"
CUOPT_STRICT_INFEASIBILITY = "strict_infeasibility"
CUOPT_PRIMAL_INFEASIBLE_TOLERANCE = "primal_infeasible_tolerance"
CUOPT_DUAL_INFEASIBLE_TOLERANCE = "dual_infeasible_tolerance"
CUOPT_ITERATION_LIMIT = "iteration_limit"
CUOPT_TIME_LIMIT = "time_limit"
CUOPT_PDLP_SOLVER_MODE = "pdlp_solver_mode"
CUOPT_METHOD = "method"
CUOPT_PER_CONSTRAINT_RESIDUAL = "per_constraint_residual"
CUOPT_SAVE_BEST_PRIMAL_SO_FAR = "save_best_primal_so_far"
CUOPT_FIRST_PRIMAL_FEASIBLE = "first_primal_feasible"
CUOPT_LOG_FILE = "log_file"
CUOPT_LOG_TO_CONSOLE = "log_to_console"
CUOPT_CROSSOVER = "crossover"
CUOPT_MIP_ABSOLUTE_TOLERANCE = "mip_absolute_tolerance"
CUOPT_MIP_RELATIVE_TOLERANCE = "mip_relative_tolerance"
CUOPT_MIP_INTEGRALITY_TOLERANCE = "mip_integrality_tolerance"
CUOPT_MIP_ABSOLUTE_GAP = "mip_absolute_gap"
CUOPT_MIP_RELATIVE_GAP = "mip_relative_gap"
CUOPT_MIP_HEURISTICS_ONLY = "mip_heuristics_only"
CUOPT_MIP_SCALING = "mip_scaling"
CUOPT_SOLUTION_FILE = "solution_file"
CUOPT_NUM_CPU_THREADS = "num_cpu_threads"
CUOPT_USER_PROBLEM_FILE = "user_problem_file"

# --- Termination status constants (constants.h:65-75) ---
CUOPT_TERIMINATION_STATUS_NO_TERMINATION = 0
CUOPT_TERIMINATION_STATUS_OPTIMAL = 1
CUOPT_TERIMINATION_STATUS_INFEASIBLE = 2
CUOPT_TERIMINATION_STATUS_UNBOUNDED = 3
CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT = 4
CUOPT_TERIMINATION_STATUS_TIME_LIMIT = 5
CUOPT_TERIMINATION_STATUS_NUMERICAL_ERROR = 6
CUOPT_TERIMINATION_STATUS_PRIMAL_FEASIBLE = 7
CUOPT_TERIMINATION_STATUS_FEASIBLE_FOUND = 8
CUOPT_TERIMINATION_STATUS_CONCURRENT_LIMIT = 9

# --- Objective sense ---
CUOPT_MINIMIZE = 1
CUOPT_MAXIMIZE = -1

# --- Constraint sense ---
CUOPT_LESS_THAN = "L"
CUOPT_GREATER_THAN = "G"
CUOPT_EQUAL = "E"

# --- Variable types ---
CUOPT_CONTINUOUS = "C"
CUOPT_INTEGER = "I"

CUOPT_INFINITY = math.inf

# --- PDLP solver modes (constants.h:98-101) ---
CUOPT_PDLP_SOLVER_MODE_STABLE1 = 0
CUOPT_PDLP_SOLVER_MODE_STABLE2 = 1
CUOPT_PDLP_SOLVER_MODE_METHODICAL1 = 2
CUOPT_PDLP_SOLVER_MODE_FAST1 = 3

# --- Methods ---
CUOPT_METHOD_CONCURRENT = 0
CUOPT_METHOD_PDLP = 1
CUOPT_METHOD_DUAL_SIMPLEX = 2

# --- Status codes (values match reference constants.h:108-114 and
# cpp/include/cuopt_c.h so error kinds survive the C ABI round trip) ---
CUOPT_SUCCESS = 0
CUOPT_INVALID_ARGUMENT = 1
CUOPT_MPS_FILE_ERROR = 2
CUOPT_MPS_PARSE_ERROR = 3
CUOPT_VALIDATION_ERROR = 4
CUOPT_OUT_OF_MEMORY = 5
CUOPT_RUNTIME_ERROR = 6
