/* C ABI smoke test: solve afiro.mps through libcuopt_tpu_c.so
 * (reference counterpart: cpp/tests/c_api_tests/c_api_test.c). */
#include <stdio.h>
#include <stdlib.h>
#include "../include/cuopt_c.h"

int main(int argc, char** argv)
{
  const char* mps = argc > 1 ? argv[1] : "afiro.mps";
  cuOptOptimizationProblem prob = NULL;
  cuOptSolverSettings settings = NULL;
  cuOptSolution sol = NULL;

  if (cuOptReadProblem(mps, &prob) != CUOPT_SUCCESS) {
    fprintf(stderr, "read failed\n");
    return 1;
  }
  cuopt_int_t nc = 0, nv = 0, nnz = 0, is_mip = -1;
  cuOptGetNumConstraints(prob, &nc);
  cuOptGetNumVariables(prob, &nv);
  cuOptGetNumNonZeros(prob, &nnz);
  cuOptIsMIP(prob, &is_mip);
  printf("problem: %d rows %d cols %d nnz mip=%d\n", nc, nv, nnz, is_mip);

  if (cuOptCreateSolverSettings(&settings) != CUOPT_SUCCESS) return 2;
  if (cuOptSetParameter(settings, "time_limit", "60") != CUOPT_SUCCESS)
    return 3;
  if (cuOptSetFloatParameter(settings, "absolute_gap_tolerance", 1e-4)
      != CUOPT_SUCCESS)
    return 3;

  if (cuOptSolve(prob, settings, &sol) != CUOPT_SUCCESS) {
    fprintf(stderr, "solve failed\n");
    return 4;
  }
  cuopt_int_t term = 0;
  cuopt_float_t obj = 0, t = 0;
  cuOptGetTerminationStatus(sol, &term);
  cuOptGetObjectiveValue(sol, &obj);
  cuOptGetSolveTime(sol, &t);
  printf("status=%d objective=%.6f time=%.2fs\n", (int)term, obj, t);

  cuopt_float_t* x = (cuopt_float_t*)malloc(sizeof(cuopt_float_t) * nv);
  if (cuOptGetPrimalSolution(sol, x) != CUOPT_SUCCESS) return 5;
  printf("x[0]=%.6f\n", x[0]);
  free(x);

  cuOptDestroySolution(&sol);
  cuOptDestroySolverSettings(&settings);
  cuOptDestroyProblem(&prob);

  /* afiro optimum is -464.753 */
  if (term != CUOPT_TERIMINATION_STATUS_OPTIMAL) return 6;
  if (obj > -464.0 || obj < -466.0) return 7;
  printf("C_API_SMOKE_OK\n");
  return 0;
}
