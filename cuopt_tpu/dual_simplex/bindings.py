"""ctypes bindings for the native dual simplex (cpp/dual_simplex).

Mirrors the reference dual_simplex entry `solve_linear_program`
(cpp/src/dual_simplex/solve.hpp:52-74). The shared library is built by
`make -C cpp`; if missing, we build it on the fly with g++ (toolchain is
guaranteed in this environment).
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess

import numpy as np

from cuopt_tpu import constants as C

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libtpu_simplex.so")
_SRC_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "cpp", "dual_simplex",
    "simplex.cpp",
)
_lib = None

# native status codes (cpp/dual_simplex/simplex.cpp Status)
DS_OPTIMAL = 0
DS_INFEASIBLE = 1
DS_UNBOUNDED = 2
DS_ITER_LIMIT = 3
DS_TIME_LIMIT = 4
DS_NUMERICAL = 5
DS_HALTED = 6

_STATUS_MAP = {
    DS_OPTIMAL: C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
    DS_INFEASIBLE: C.CUOPT_TERIMINATION_STATUS_INFEASIBLE,
    DS_UNBOUNDED: C.CUOPT_TERIMINATION_STATUS_UNBOUNDED,
    DS_ITER_LIMIT: C.CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT,
    DS_TIME_LIMIT: C.CUOPT_TERIMINATION_STATUS_TIME_LIMIT,
    DS_NUMERICAL: C.CUOPT_TERIMINATION_STATUS_NUMERICAL_ERROR,
    DS_HALTED: C.CUOPT_TERIMINATION_STATUS_CONCURRENT_LIMIT,
}


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.abspath(_SRC_PATH)
    src_dir = os.path.dirname(src)
    newest = max(
        (os.path.getmtime(os.path.join(src_dir, f))
         for f in os.listdir(src_dir)
         if f.endswith((".cpp", ".hpp", ".h"))),
        default=0.0,
    ) if os.path.isdir(src_dir) else 0.0
    stale = (
        os.path.exists(src)
        and (not os.path.exists(_LIB_PATH)
             or newest > os.path.getmtime(_LIB_PATH))
    )
    if stale:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-o",
             _LIB_PATH, src],
            check=True, capture_output=True,
        )
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ds_solve.restype = ctypes.c_int
    lib.ds_solve.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        ctypes.c_double, ctypes.c_int,
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int),
    ]
    # extended entry: warm basis statuses + PDLP crossover hints
    lib.ds_solve_adv.restype = ctypes.c_int
    lib.ds_solve_adv.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        ctypes.c_double, ctypes.c_int,
        ctypes.c_void_p,
        ctypes.c_void_p,  # vstat_in (int8*) or NULL
        ctypes.c_void_p,  # x_hint (double*) or NULL
        ctypes.c_void_p,  # y_hint (double*) or NULL
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_void_p,  # vstat_out (int8*) or NULL
    ]
    _lib = lib
    return lib


def solve_lp_simplex(prob, settings, timer, halt=None, vstat=None,
                     x_hint=None, y_hint=None, want_vstat=False):
    """Solve with the native dual simplex. Returns the raw solution dict
    (same schema as PdlpSolver.run).

    vstat: optional int8[n+m] warm basis statuses (0 lower / 1 upper /
    2 basic) from a previous solve (B&B node re-solves). x_hint/y_hint:
    optional PDLP point for crossover placements (user sense; converted
    to minimize space here). want_vstat: include final basis statuses in
    the result under "vstat"."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native simplex library unavailable")
    n, m = prob.n_variables, prob.n_constraints
    # CSR -> CSC
    from cuopt_tpu.sparse.ops import _transpose_csr

    t_off, t_idx, t_val, _ = _transpose_csr(
        prob.offsets, prob.indices, prob.values, m, n
    )
    sign = -1.0 if prob.maximize else 1.0
    c = np.ascontiguousarray(sign * prob.objective_coefficients, np.float64)
    x = np.zeros(n)
    y = np.zeros(m)
    dj = np.zeros(n)
    obj = ctypes.c_double()
    iters = ctypes.c_int()
    halt_ptr = ctypes.cast(halt, ctypes.c_void_p) if halt is not None \
        else None
    tl = timer.remaining() if timer is not None else math.inf
    # settings.time_limit caps the slice too (the MIP root gives the
    # simplex a bounded budget ON TOP of the global clock; ignoring it
    # let a degenerate root burn the whole MIP limit in r04)
    s_tl = getattr(settings, "time_limit", math.inf)
    if s_tl:
        tl = min(tl, s_tl)
    if not math.isfinite(tl):
        tl = 1e18

    def _opt_ptr(arr, dtype):
        if arr is None:
            return None
        a = np.ascontiguousarray(arr, dtype)
        return (a, a.ctypes.data_as(ctypes.c_void_p))

    vstat_in = _opt_ptr(vstat, np.int8)
    xh = _opt_ptr(x_hint, np.float64)
    # y hint converted to minimize space (the native core minimizes)
    yh = _opt_ptr(
        None if y_hint is None else sign * np.asarray(y_hint, np.float64),
        np.float64,
    )
    vstat_out = np.zeros(n + m, np.int8) if want_vstat else None

    status = lib.ds_solve_adv(
        m, n,
        np.ascontiguousarray(t_off, np.int64),
        np.ascontiguousarray(t_idx, np.int64),
        np.ascontiguousarray(t_val, np.float64),
        c,
        np.ascontiguousarray(prob.variable_lower_bounds, np.float64),
        np.ascontiguousarray(prob.variable_upper_bounds, np.float64),
        np.ascontiguousarray(prob.constraint_lower_bounds, np.float64),
        np.ascontiguousarray(prob.constraint_upper_bounds, np.float64),
        float(tl),
        int(min(getattr(settings, "iteration_limit", 1 << 30), 1 << 30)),
        halt_ptr,
        None if vstat_in is None else vstat_in[1],
        None if xh is None else xh[1],
        None if yh is None else yh[1],
        x, y, dj, ctypes.byref(obj), ctypes.byref(iters),
        None if vstat_out is None else
        vstat_out.ctypes.data_as(ctypes.c_void_p),
    )
    primal_obj = obj.value + sign * prob.objective_offset
    raw = {
        "status": _STATUS_MAP.get(status,
                                  C.CUOPT_TERIMINATION_STATUS_NUMERICAL_ERROR),
        "iterations": iters.value,
        "attempts": iters.value,
        "solve_time": timer.elapsed() if timer is not None else 0.0,
        "primal_solution": x,
        "dual_solution": sign * y,
        "reduced_cost": sign * dj,
        "primal_objective": sign * primal_obj,
        "dual_objective": sign * primal_obj,
        "gap": 0.0,
        "l2_primal_residual": 0.0,
        "l2_dual_residual": 0.0,
        "linf_primal_residual": 0.0,
        "linf_dual_residual": 0.0,
        "solved_by": "dual_simplex",
    }
    if vstat_out is not None:
        raw["vstat"] = vstat_out
    return raw


def set_simplex_options(pivot_tolerance=None, primal_feasibility_tolerance=None,
                        dual_feasibility_tolerance=None,
                        refactor_frequency=None, big_bound=None):
    """Configure the native simplex (reference
    simplex_solver_settings.hpp:35-67 exposes the same knobs). Unset
    fields keep their current values. Set before solving; concurrent
    solves share the options."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native simplex library unavailable")
    if not hasattr(lib, "ds_set_options"):
        raise RuntimeError("libtpu_simplex.so predates ds_set_options")
    lib.ds_set_options.restype = None
    lib.ds_set_options.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_double,
    ]
    lib.ds_set_options(
        -1.0 if pivot_tolerance is None else float(pivot_tolerance),
        -1.0 if primal_feasibility_tolerance is None
        else float(primal_feasibility_tolerance),
        -1.0 if dual_feasibility_tolerance is None
        else float(dual_feasibility_tolerance),
        -1 if refactor_frequency is None else int(refactor_frequency),
        -1.0 if big_bound is None else float(big_bound),
    )


def last_used_big_bounds() -> bool:
    """Whether the LAST native solve fell back to temporary kBig bounds
    for a free column (the reference's phase-1 territory,
    dual_simplex/phase1.cpp; here free columns enter the initial basis
    instead and tests assert this stays False)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "ds_last_used_big_bounds"):
        return False
    lib.ds_last_used_big_bounds.restype = ctypes.c_int
    return bool(lib.ds_last_used_big_bounds())


def get_simplex_options() -> dict:
    lib = load_library()
    lib.ds_get_options.restype = None
    lib.ds_get_options.argtypes = [np.ctypeslib.ndpointer(np.float64)]
    out = np.zeros(5)
    lib.ds_get_options(out)
    return {
        "pivot_tolerance": out[0],
        "primal_feasibility_tolerance": out[1],
        "dual_feasibility_tolerance": out[2],
        "refactor_frequency": int(out[3]),
        "big_bound": out[4],
    }
