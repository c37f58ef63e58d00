/* C ABI for the cuopt_tpu optimization engine.
 *
 * Mirrors the reference C API surface
 * (cpp/include/cuopt/linear_programming/cuopt_c.h:106-668): opaque
 * handles for problem/settings/solution, CSR problem construction, MPS
 * reading, the string-keyed parameter system, solve dispatch (LP vs
 * MIP), and solution accessors. Implemented by cpp/c_api/cuopt_c.c,
 * which embeds a Python interpreter running the cuopt_tpu engine (the
 * compute path itself is JAX/XLA on TPU).
 */
#ifndef CUOPT_TPU_C_H
#define CUOPT_TPU_C_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int32_t cuopt_int_t;
typedef double cuopt_float_t;

typedef void* cuOptOptimizationProblem;
typedef void* cuOptSolverSettings;
typedef void* cuOptSolution;

/* status codes (values match reference constants.h:108-114 so C
 * callers can distinguish error kinds across both ABIs) */
#define CUOPT_SUCCESS 0
#define CUOPT_INVALID_ARGUMENT 1
#define CUOPT_MPS_FILE_ERROR 2
#define CUOPT_MPS_PARSE_ERROR 3
#define CUOPT_VALIDATION_ERROR 4
#define CUOPT_OUT_OF_MEMORY 5
#define CUOPT_RUNTIME_ERROR 6
/* generic failure (embed bridge unavailable etc.) */
#define CUOPT_ERROR CUOPT_RUNTIME_ERROR

#define CUOPT_MINIMIZE 1
#define CUOPT_MAXIMIZE -1

#define CUOPT_LESS_THAN 'L'
#define CUOPT_GREATER_THAN 'G'
#define CUOPT_EQUAL 'E'
#define CUOPT_CONTINUOUS 'C'
#define CUOPT_INTEGER 'I'

/* termination statuses (reference constants.h) */
#define CUOPT_TERIMINATION_STATUS_OPTIMAL 1
#define CUOPT_TERIMINATION_STATUS_INFEASIBLE 2
#define CUOPT_TERIMINATION_STATUS_UNBOUNDED 3
#define CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT 4
#define CUOPT_TERIMINATION_STATUS_TIME_LIMIT 5
#define CUOPT_TERIMINATION_STATUS_NUMERICAL_ERROR 6
#define CUOPT_TERIMINATION_STATUS_PRIMAL_FEASIBLE 7
#define CUOPT_TERIMINATION_STATUS_FEASIBLE_FOUND 8

cuopt_int_t cuOptReadProblem(const char* filename,
                             cuOptOptimizationProblem* problem_ptr);

cuopt_int_t cuOptCreateProblem(
    cuopt_int_t num_constraints, cuopt_int_t num_variables,
    cuopt_int_t objective_sense, cuopt_float_t objective_offset,
    const cuopt_float_t* objective_coefficients,
    const cuopt_int_t* constraint_matrix_row_offsets,
    const cuopt_int_t* constraint_matrix_column_indices,
    const cuopt_float_t* constraint_matrix_coefficient_values,
    const char* constraint_sense, const cuopt_float_t* rhs,
    const cuopt_float_t* lower_bounds, const cuopt_float_t* upper_bounds,
    const char* variable_types, cuOptOptimizationProblem* problem_ptr);

cuopt_int_t cuOptCreateRangedProblem(
    cuopt_int_t num_constraints, cuopt_int_t num_variables,
    cuopt_int_t objective_sense, cuopt_float_t objective_offset,
    const cuopt_float_t* objective_coefficients,
    const cuopt_int_t* constraint_matrix_row_offsets,
    const cuopt_int_t* constraint_matrix_column_indices,
    const cuopt_float_t* constraint_matrix_coefficient_values,
    const cuopt_float_t* constraint_lower_bounds,
    const cuopt_float_t* constraint_upper_bounds,
    const cuopt_float_t* lower_bounds, const cuopt_float_t* upper_bounds,
    const char* variable_types, cuOptOptimizationProblem* problem_ptr);

cuopt_int_t cuOptDestroyProblem(cuOptOptimizationProblem* problem_ptr);

cuopt_int_t cuOptGetNumConstraints(cuOptOptimizationProblem problem,
                                   cuopt_int_t* out);
cuopt_int_t cuOptGetNumVariables(cuOptOptimizationProblem problem,
                                 cuopt_int_t* out);
cuopt_int_t cuOptGetNumNonZeros(cuOptOptimizationProblem problem,
                                cuopt_int_t* out);
cuopt_int_t cuOptGetObjectiveSense(cuOptOptimizationProblem problem,
                                   cuopt_int_t* out);
cuopt_int_t cuOptGetObjectiveOffset(cuOptOptimizationProblem problem,
                                    cuopt_float_t* out);
cuopt_int_t cuOptGetObjectiveCoefficients(
    cuOptOptimizationProblem problem, cuopt_float_t* out);
cuopt_int_t cuOptGetConstraintMatrix(
    cuOptOptimizationProblem problem, cuopt_int_t* offsets,
    cuopt_int_t* indices, cuopt_float_t* values);
cuopt_int_t cuOptGetConstraintSense(cuOptOptimizationProblem problem,
                                    char* out);
cuopt_int_t cuOptGetConstraintRightHandSide(
    cuOptOptimizationProblem problem, cuopt_float_t* out);
cuopt_int_t cuOptGetConstraintLowerBounds(
    cuOptOptimizationProblem problem, cuopt_float_t* out);
cuopt_int_t cuOptGetConstraintUpperBounds(
    cuOptOptimizationProblem problem, cuopt_float_t* out);
cuopt_int_t cuOptGetVariableLowerBounds(
    cuOptOptimizationProblem problem, cuopt_float_t* out);
cuopt_int_t cuOptGetVariableUpperBounds(
    cuOptOptimizationProblem problem, cuopt_float_t* out);
cuopt_int_t cuOptGetVariableTypes(cuOptOptimizationProblem problem,
                                  char* out);
cuopt_int_t cuOptIsMIP(cuOptOptimizationProblem problem,
                       cuopt_int_t* out);

cuopt_int_t cuOptCreateSolverSettings(cuOptSolverSettings* settings_ptr);
cuopt_int_t cuOptDestroySolverSettings(cuOptSolverSettings* settings_ptr);
cuopt_int_t cuOptSetParameter(cuOptSolverSettings settings,
                              const char* name, const char* value);
cuopt_int_t cuOptGetParameter(cuOptSolverSettings settings,
                              const char* name, cuopt_int_t value_size,
                              char* value);
cuopt_int_t cuOptSetFloatParameter(cuOptSolverSettings settings,
                                   const char* name, cuopt_float_t value);
cuopt_int_t cuOptSetIntegerParameter(cuOptSolverSettings settings,
                                     const char* name, cuopt_int_t value);
cuopt_int_t cuOptGetFloatParameter(cuOptSolverSettings settings,
                                   const char* name, cuopt_float_t* out);
cuopt_int_t cuOptGetIntegerParameter(cuOptSolverSettings settings,
                                     const char* name, cuopt_int_t* out);

cuopt_int_t cuOptSolve(cuOptOptimizationProblem problem,
                       cuOptSolverSettings settings,
                       cuOptSolution* solution_ptr);
cuopt_int_t cuOptDestroySolution(cuOptSolution* solution_ptr);

cuopt_int_t cuOptGetTerminationStatus(cuOptSolution solution,
                                      cuopt_int_t* out);
cuopt_int_t cuOptGetObjectiveValue(cuOptSolution solution,
                                   cuopt_float_t* out);
cuopt_int_t cuOptGetPrimalSolution(cuOptSolution solution,
                                   cuopt_float_t* out);
cuopt_int_t cuOptGetDualSolution(cuOptSolution solution,
                                 cuopt_float_t* out);
cuopt_int_t cuOptGetReducedCosts(cuOptSolution solution,
                                 cuopt_float_t* out);
cuopt_int_t cuOptGetSolveTime(cuOptSolution solution, cuopt_float_t* out);
cuopt_int_t cuOptGetMIPGap(cuOptSolution solution, cuopt_float_t* out);
cuopt_int_t cuOptGetSolutionBound(cuOptSolution solution,
                                  cuopt_float_t* out);

cuopt_int_t cuOptGetIntSize(void);
cuopt_int_t cuOptGetFloatSize(void);

#ifdef __cplusplus
}
#endif
#endif /* CUOPT_TPU_C_H */
