/* C ABI implementation: embeds a Python interpreter running the
 * cuopt_tpu engine and forwards every call to cuopt_tpu.c_api_embed.
 *
 * Reference counterpart: cpp/src/linear_programming/cuopt_c.cpp (849
 * LoC, same function surface over the native C++ engine). Here the
 * engine's compute path is JAX/XLA, so the natural native boundary is
 * interpreter embedding rather than a reimplementation; handles are
 * integer ids (no PyObject crosses the ABI).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

#include "../include/cuopt_c.h"

static PyObject* g_mod = NULL;

/* handle = integer id boxed on the heap so handles are pointers */
typedef struct { long id; } handle_t;

static handle_t* box(long id)
{
  handle_t* h = (handle_t*)malloc(sizeof(handle_t));
  h->id = id;
  return h;
}

static long hid(void* h) { return h ? ((handle_t*)h)->id : 0; }

static int ensure_init(void)
{
  if (g_mod) return 0;
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* mod = PyImport_ImportModule("cuopt_tpu.c_api_embed");
  if (!mod) {
    PyErr_Print();
    PyGILState_Release(g);
    return -1;
  }
  g_mod = mod;
  PyGILState_Release(g);
  return 0;
}

/* call a bridge function returning (status, handle_id) */
static cuopt_int_t call_handle_out(const char* fn, PyObject* args,
                                   void** out)
{
  if (ensure_init()) return CUOPT_ERROR;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* f = PyObject_GetAttrString(g_mod, fn);
  PyObject* r = f ? PyObject_CallObject(f, args) : NULL;
  Py_XDECREF(f);
  Py_XDECREF(args);
  cuopt_int_t st = CUOPT_ERROR;
  if (r && PyTuple_Check(r)) {
    st = (cuopt_int_t)PyLong_AsLong(PyTuple_GetItem(r, 0));
    long id = PyLong_AsLong(PyTuple_GetItem(r, 1));
    if (st == CUOPT_SUCCESS && out) *out = box(id);
  } else if (!r) {
    PyErr_Print();
  }
  Py_XDECREF(r);
  PyGILState_Release(g);
  return st;
}

/* call returning (status, float) */
static cuopt_int_t call_float_out(const char* fn, PyObject* args,
                                  double* out)
{
  if (ensure_init()) return CUOPT_ERROR;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* f = PyObject_GetAttrString(g_mod, fn);
  PyObject* r = f ? PyObject_CallObject(f, args) : NULL;
  Py_XDECREF(f);
  Py_XDECREF(args);
  cuopt_int_t st = CUOPT_ERROR;
  if (r && PyTuple_Check(r)) {
    st = (cuopt_int_t)PyLong_AsLong(PyTuple_GetItem(r, 0));
    if (out) *out = PyFloat_AsDouble(PyTuple_GetItem(r, 1));
  } else if (!r) {
    PyErr_Print();
  }
  Py_XDECREF(r);
  PyGILState_Release(g);
  return st;
}

/* call returning (status, bytes); memcpy into caller buffer */
static cuopt_int_t call_bytes_out(const char* fn, PyObject* args,
                                  void* out)
{
  if (ensure_init()) return CUOPT_ERROR;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* f = PyObject_GetAttrString(g_mod, fn);
  PyObject* r = f ? PyObject_CallObject(f, args) : NULL;
  Py_XDECREF(f);
  Py_XDECREF(args);
  cuopt_int_t st = CUOPT_ERROR;
  if (r && PyTuple_Check(r)) {
    st = (cuopt_int_t)PyLong_AsLong(PyTuple_GetItem(r, 0));
    PyObject* b = PyTuple_GetItem(r, 1);
    if (st == CUOPT_SUCCESS && out && PyBytes_Check(b)) {
      memcpy(out, PyBytes_AsString(b), (size_t)PyBytes_Size(b));
    }
  } else if (!r) {
    PyErr_Print();
  }
  Py_XDECREF(r);
  PyGILState_Release(g);
  return st;
}

static cuopt_int_t call_status(const char* fn, PyObject* args)
{
  if (ensure_init()) return CUOPT_ERROR;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* f = PyObject_GetAttrString(g_mod, fn);
  PyObject* r = f ? PyObject_CallObject(f, args) : NULL;
  Py_XDECREF(f);
  Py_XDECREF(args);
  cuopt_int_t st = CUOPT_ERROR;
  if (r) st = (cuopt_int_t)PyLong_AsLong(r);
  else PyErr_Print();
  Py_XDECREF(r);
  PyGILState_Release(g);
  return st;
}

/* ------------------------------------------------------------ problem */
cuopt_int_t cuOptReadProblem(const char* filename,
                             cuOptOptimizationProblem* problem_ptr)
{
  if (ensure_init()) return CUOPT_ERROR;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(s)", filename);
  PyGILState_Release(g);
  return call_handle_out("read_problem", args, problem_ptr);
}

cuopt_int_t cuOptCreateProblem(
    cuopt_int_t nc, cuopt_int_t nv, cuopt_int_t sense,
    cuopt_float_t offset, const cuopt_float_t* obj,
    const cuopt_int_t* offs, const cuopt_int_t* idx,
    const cuopt_float_t* vals, const char* csense,
    const cuopt_float_t* rhs, const cuopt_float_t* lb,
    const cuopt_float_t* ub, const char* vt,
    cuOptOptimizationProblem* problem_ptr)
{
  if (ensure_init()) return CUOPT_ERROR;
  /* reference returns CUOPT_INVALID_ARGUMENT for any required NULL
   * pointer (cuopt_c.cpp:107) — a NULL reaching the embed bridge would
   * segfault in from_address */
  if (!problem_ptr || !obj || !csense || !rhs || !vt ||
      (nc > 0 && (!offs || !idx || !vals)))
    return CUOPT_INVALID_ARGUMENT;
  cuopt_int_t nnz = offs ? offs[nc] : 0;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue(
      "(iidLLLLLLLLLi)", (int)nc, (int)nv, (int)sense, (double)offset,
      (long long)(intptr_t)obj, (long long)(intptr_t)offs,
      (long long)(intptr_t)idx, (long long)(intptr_t)vals,
      (long long)(intptr_t)csense, (long long)(intptr_t)rhs,
      (long long)(intptr_t)lb, (long long)(intptr_t)ub,
      (long long)(intptr_t)vt, (int)nnz);
  PyGILState_Release(g);
  return call_handle_out("create_problem", args, problem_ptr);
}

cuopt_int_t cuOptCreateRangedProblem(
    cuopt_int_t nc, cuopt_int_t nv, cuopt_int_t sense,
    cuopt_float_t offset, const cuopt_float_t* obj,
    const cuopt_int_t* offs, const cuopt_int_t* idx,
    const cuopt_float_t* vals, const cuopt_float_t* clb,
    const cuopt_float_t* cub, const cuopt_float_t* lb,
    const cuopt_float_t* ub, const char* vt,
    cuOptOptimizationProblem* problem_ptr)
{
  if (ensure_init()) return CUOPT_ERROR;
  if (!problem_ptr || !obj || !clb || !cub || !vt ||
      (nc > 0 && (!offs || !idx || !vals)))
    return CUOPT_INVALID_ARGUMENT;
  cuopt_int_t nnz = offs ? offs[nc] : 0;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue(
      "(iidLLLLLLLLLi)", (int)nc, (int)nv, (int)sense, (double)offset,
      (long long)(intptr_t)obj, (long long)(intptr_t)offs,
      (long long)(intptr_t)idx, (long long)(intptr_t)vals,
      (long long)(intptr_t)clb, (long long)(intptr_t)cub,
      (long long)(intptr_t)lb, (long long)(intptr_t)ub,
      (long long)(intptr_t)vt, (int)nnz);
  PyGILState_Release(g);
  return call_handle_out("create_ranged_problem", args, problem_ptr);
}

static cuopt_int_t destroy_generic(void** ptr)
{
  if (!ptr || !*ptr) return CUOPT_SUCCESS;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(l)", hid(*ptr));
  PyGILState_Release(g);
  cuopt_int_t st = call_status("destroy", args);
  free(*ptr);
  *ptr = NULL;
  return st;
}

cuopt_int_t cuOptDestroyProblem(cuOptOptimizationProblem* p)
{
  return destroy_generic(p);
}

static cuopt_int_t prob_scalar_int(void* h, const char* what,
                                   cuopt_int_t* out)
{
  double v = 0;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ls)", hid(h), what);
  PyGILState_Release(g);
  cuopt_int_t st = call_float_out("prob_scalar", args, &v);
  if (out) *out = (cuopt_int_t)v;
  return st;
}

cuopt_int_t cuOptGetNumConstraints(cuOptOptimizationProblem p,
                                   cuopt_int_t* out)
{
  return prob_scalar_int(p, "num_constraints", out);
}
cuopt_int_t cuOptGetNumVariables(cuOptOptimizationProblem p,
                                 cuopt_int_t* out)
{
  return prob_scalar_int(p, "num_variables", out);
}
cuopt_int_t cuOptGetNumNonZeros(cuOptOptimizationProblem p,
                                cuopt_int_t* out)
{
  return prob_scalar_int(p, "num_nonzeros", out);
}
cuopt_int_t cuOptGetObjectiveSense(cuOptOptimizationProblem p,
                                   cuopt_int_t* out)
{
  return prob_scalar_int(p, "objective_sense", out);
}
cuopt_int_t cuOptIsMIP(cuOptOptimizationProblem p, cuopt_int_t* out)
{
  return prob_scalar_int(p, "is_mip", out);
}
cuopt_int_t cuOptGetObjectiveOffset(cuOptOptimizationProblem p,
                                    cuopt_float_t* out)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ls)", hid(p), "objective_offset");
  PyGILState_Release(g);
  return call_float_out("prob_scalar", args, out);
}

static cuopt_int_t prob_arr(void* h, const char* what, void* out)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ls)", hid(h), what);
  PyGILState_Release(g);
  return call_bytes_out("prob_array", args, out);
}

cuopt_int_t cuOptGetObjectiveCoefficients(cuOptOptimizationProblem p,
                                          cuopt_float_t* out)
{
  return prob_arr(p, "objective_coefficients", out);
}
cuopt_int_t cuOptGetConstraintRightHandSide(cuOptOptimizationProblem p,
                                            cuopt_float_t* out)
{
  return prob_arr(p, "rhs", out);
}
cuopt_int_t cuOptGetConstraintLowerBounds(cuOptOptimizationProblem p,
                                          cuopt_float_t* out)
{
  return prob_arr(p, "constraint_lower_bounds", out);
}
cuopt_int_t cuOptGetConstraintUpperBounds(cuOptOptimizationProblem p,
                                          cuopt_float_t* out)
{
  return prob_arr(p, "constraint_upper_bounds", out);
}
cuopt_int_t cuOptGetVariableLowerBounds(cuOptOptimizationProblem p,
                                        cuopt_float_t* out)
{
  return prob_arr(p, "variable_lower_bounds", out);
}
cuopt_int_t cuOptGetVariableUpperBounds(cuOptOptimizationProblem p,
                                        cuopt_float_t* out)
{
  return prob_arr(p, "variable_upper_bounds", out);
}

cuopt_int_t cuOptGetVariableTypes(cuOptOptimizationProblem p, char* out)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ls)", hid(p), "variable_types");
  PyGILState_Release(g);
  return call_bytes_out("prob_types", args, out);
}
cuopt_int_t cuOptGetConstraintSense(cuOptOptimizationProblem p,
                                    char* out)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ls)", hid(p), "constraint_sense");
  PyGILState_Release(g);
  return call_bytes_out("prob_types", args, out);
}

cuopt_int_t cuOptGetConstraintMatrix(cuOptOptimizationProblem p,
                                     cuopt_int_t* offsets,
                                     cuopt_int_t* indices,
                                     cuopt_float_t* values)
{
  if (ensure_init()) return CUOPT_ERROR;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* f = PyObject_GetAttrString(g_mod, "prob_matrix");
  PyObject* r =
      f ? PyObject_CallFunction(f, "(l)", hid(p)) : NULL;
  Py_XDECREF(f);
  cuopt_int_t st = CUOPT_ERROR;
  if (r && PyTuple_Check(r)) {
    st = (cuopt_int_t)PyLong_AsLong(PyTuple_GetItem(r, 0));
    if (st == CUOPT_SUCCESS) {
      PyObject* o = PyTuple_GetItem(r, 1);
      PyObject* i = PyTuple_GetItem(r, 2);
      PyObject* v = PyTuple_GetItem(r, 3);
      if (offsets) memcpy(offsets, PyBytes_AsString(o),
                          (size_t)PyBytes_Size(o));
      if (indices) memcpy(indices, PyBytes_AsString(i),
                          (size_t)PyBytes_Size(i));
      if (values) memcpy(values, PyBytes_AsString(v),
                         (size_t)PyBytes_Size(v));
    }
  } else if (!r) {
    PyErr_Print();
  }
  Py_XDECREF(r);
  PyGILState_Release(g);
  return st;
}

/* ----------------------------------------------------------- settings */
cuopt_int_t cuOptCreateSolverSettings(cuOptSolverSettings* out)
{
  if (ensure_init()) return CUOPT_ERROR;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("()");
  PyGILState_Release(g);
  return call_handle_out("create_settings", args, out);
}
cuopt_int_t cuOptDestroySolverSettings(cuOptSolverSettings* s)
{
  return destroy_generic(s);
}
cuopt_int_t cuOptSetParameter(cuOptSolverSettings s, const char* name,
                              const char* value)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(lss)", hid(s), name, value);
  PyGILState_Release(g);
  return call_status("set_parameter", args);
}
cuopt_int_t cuOptGetParameter(cuOptSolverSettings s, const char* name,
                              cuopt_int_t value_size, char* value)
{
  if (ensure_init()) return CUOPT_ERROR;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* f = PyObject_GetAttrString(g_mod, "get_parameter");
  PyObject* r =
      f ? PyObject_CallFunction(f, "(ls)", hid(s), name) : NULL;
  Py_XDECREF(f);
  cuopt_int_t st = CUOPT_ERROR;
  if (r && PyTuple_Check(r)) {
    st = (cuopt_int_t)PyLong_AsLong(PyTuple_GetItem(r, 0));
    const char* v = PyUnicode_AsUTF8(PyTuple_GetItem(r, 1));
    if (value && v) {
      strncpy(value, v, (size_t)value_size - 1);
      value[value_size - 1] = 0;
    }
  } else if (!r) {
    PyErr_Print();
  }
  Py_XDECREF(r);
  PyGILState_Release(g);
  return st;
}
cuopt_int_t cuOptSetFloatParameter(cuOptSolverSettings s,
                                   const char* name, cuopt_float_t v)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(lsd)", hid(s), name, v);
  PyGILState_Release(g);
  return call_status("set_float_parameter", args);
}
cuopt_int_t cuOptSetIntegerParameter(cuOptSolverSettings s,
                                     const char* name, cuopt_int_t v)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(lsi)", hid(s), name, (int)v);
  PyGILState_Release(g);
  return call_status("set_integer_parameter", args);
}
cuopt_int_t cuOptGetFloatParameter(cuOptSolverSettings s,
                                   const char* name, cuopt_float_t* out)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ls)", hid(s), name);
  PyGILState_Release(g);
  return call_float_out("get_float_parameter", args, out);
}
cuopt_int_t cuOptGetIntegerParameter(cuOptSolverSettings s,
                                     const char* name, cuopt_int_t* out)
{
  double v = 0;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ls)", hid(s), name);
  PyGILState_Release(g);
  cuopt_int_t st = call_float_out("get_integer_parameter", args, &v);
  if (out) *out = (cuopt_int_t)v;
  return st;
}

/* -------------------------------------------------------------- solve */
cuopt_int_t cuOptSolve(cuOptOptimizationProblem p, cuOptSolverSettings s,
                       cuOptSolution* out)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ll)", hid(p), hid(s));
  PyGILState_Release(g);
  return call_handle_out("solve", args, out);
}
cuopt_int_t cuOptDestroySolution(cuOptSolution* s)
{
  return destroy_generic(s);
}

static cuopt_int_t sol_scalar(void* h, const char* what, double* out)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ls)", hid(h), what);
  PyGILState_Release(g);
  return call_float_out("sol_scalar", args, out);
}

cuopt_int_t cuOptGetTerminationStatus(cuOptSolution s, cuopt_int_t* out)
{
  double v = 0;
  cuopt_int_t st = sol_scalar(s, "termination_status", &v);
  if (out) *out = (cuopt_int_t)v;
  return st;
}
cuopt_int_t cuOptGetObjectiveValue(cuOptSolution s, cuopt_float_t* out)
{
  return sol_scalar(s, "objective_value", out);
}
cuopt_int_t cuOptGetSolveTime(cuOptSolution s, cuopt_float_t* out)
{
  return sol_scalar(s, "solve_time", out);
}
cuopt_int_t cuOptGetMIPGap(cuOptSolution s, cuopt_float_t* out)
{
  return sol_scalar(s, "mip_gap", out);
}
cuopt_int_t cuOptGetSolutionBound(cuOptSolution s, cuopt_float_t* out)
{
  return sol_scalar(s, "solution_bound", out);
}

static cuopt_int_t sol_arr(void* h, const char* what, void* out)
{
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = Py_BuildValue("(ls)", hid(h), what);
  PyGILState_Release(g);
  return call_bytes_out("sol_array", args, out);
}

cuopt_int_t cuOptGetPrimalSolution(cuOptSolution s, cuopt_float_t* out)
{
  return sol_arr(s, "primal_solution", out);
}
cuopt_int_t cuOptGetDualSolution(cuOptSolution s, cuopt_float_t* out)
{
  return sol_arr(s, "dual_solution", out);
}
cuopt_int_t cuOptGetReducedCosts(cuOptSolution s, cuopt_float_t* out)
{
  return sol_arr(s, "reduced_costs", out);
}

cuopt_int_t cuOptGetIntSize(void) { return (cuopt_int_t)sizeof(cuopt_int_t); }
cuopt_int_t cuOptGetFloatSize(void)
{
  return (cuopt_int_t)sizeof(cuopt_float_t);
}
