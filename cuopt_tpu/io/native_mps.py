"""ctypes binding for the native C++ MPS parser (cpp/mps_parser/).

Role parity with the reference's separately-packaged native parser
(cpp/libmps_parser/, wheel `cuopt_mps_parser`): the heavy tokenization and
CSR assembly run in C++; Python only wraps the flat arrays into an
OptimizationProblem. Falls back to the pure-Python parser
(cuopt_tpu/io/mps_parser.py) when the shared library is not built.
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

from cuopt_tpu.problem.data_model import OptimizationProblem
from cuopt_tpu.utils.errors import MpsParseError

_LIB_PATH = pathlib.Path(__file__).parent / "libtpu_mps.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        # build on demand (binaries are not committed; same pattern as
        # dual_simplex/bindings.py)
        src = _LIB_PATH.parent.parent.parent / "cpp" / "mps_parser" / \
            "mps_parser.cpp"
        if not src.exists():
            return None
        import subprocess
        try:
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-o",
                 str(_LIB_PATH), str(src)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mps_parse.restype = ctypes.c_void_p
    lib.mps_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.mps_parse_string.restype = ctypes.c_void_p
    lib.mps_parse_string.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.mps_error.restype = ctypes.c_char_p
    lib.mps_error.argtypes = [ctypes.c_void_p]
    for fn in ("mps_num_rows", "mps_num_cols", "mps_num_nnz"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.mps_maximize.restype = ctypes.c_int
    lib.mps_maximize.argtypes = [ctypes.c_void_p]
    lib.mps_objective_offset.restype = ctypes.c_double
    lib.mps_objective_offset.argtypes = [ctypes.c_void_p]
    P = ctypes.POINTER
    lib.mps_get_csr.argtypes = [
        ctypes.c_void_p, P(ctypes.c_int64), P(ctypes.c_int64),
        P(ctypes.c_double),
    ]
    lib.mps_get_objective.argtypes = [ctypes.c_void_p, P(ctypes.c_double)]
    lib.mps_get_constraint_bounds.argtypes = [
        ctypes.c_void_p, P(ctypes.c_double), P(ctypes.c_double),
        P(ctypes.c_double),
    ]
    lib.mps_get_variable_bounds.argtypes = [
        ctypes.c_void_p, P(ctypes.c_double), P(ctypes.c_double),
    ]
    lib.mps_get_types.argtypes = [
        ctypes.c_void_p, P(ctypes.c_char), P(ctypes.c_char),
    ]
    lib.mps_problem_name.restype = ctypes.c_char_p
    lib.mps_problem_name.argtypes = [ctypes.c_void_p]
    lib.mps_objective_name.restype = ctypes.c_char_p
    lib.mps_objective_name.argtypes = [ctypes.c_void_p]
    lib.mps_var_name.restype = ctypes.c_char_p
    lib.mps_var_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mps_row_name.restype = ctypes.c_char_p
    lib.mps_row_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mps_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def _extract(lib, h) -> OptimizationProblem:
    err = lib.mps_error(h)
    if err is not None:
        msg = err.decode("utf-8", "replace")
        lib.mps_free(h)
        raise MpsParseError(msg)
    n = lib.mps_num_rows(h)
    m = lib.mps_num_cols(h)
    nnz = lib.mps_num_nnz(h)
    offsets = np.zeros(n + 1, np.int64)
    indices = np.zeros(max(nnz, 1), np.int64)
    values = np.zeros(max(nnz, 1), np.float64)
    lib.mps_get_csr(h, _ptr(offsets, ctypes.c_int64),
                    _ptr(indices, ctypes.c_int64),
                    _ptr(values, ctypes.c_double))
    c = np.zeros(max(m, 1), np.float64)
    lib.mps_get_objective(h, _ptr(c, ctypes.c_double))
    lc = np.zeros(max(n, 1), np.float64)
    uc = np.zeros(max(n, 1), np.float64)
    rhs = np.zeros(max(n, 1), np.float64)
    lib.mps_get_constraint_bounds(h, _ptr(lc, ctypes.c_double),
                                  _ptr(uc, ctypes.c_double),
                                  _ptr(rhs, ctypes.c_double))
    lv = np.zeros(max(m, 1), np.float64)
    uv = np.zeros(max(m, 1), np.float64)
    lib.mps_get_variable_bounds(h, _ptr(lv, ctypes.c_double),
                                _ptr(uv, ctypes.c_double))
    row_t = np.zeros(max(n, 1), "S1")
    var_t = np.zeros(max(m, 1), "S1")
    lib.mps_get_types(h, _ptr(row_t, ctypes.c_char),
                      _ptr(var_t, ctypes.c_char))
    prob = OptimizationProblem(
        offsets=offsets,
        indices=indices[:nnz],
        values=values[:nnz],
        objective_coefficients=c[:m],
        objective_offset=lib.mps_objective_offset(h),
        maximize=bool(lib.mps_maximize(h)),
        constraint_lower_bounds=lc[:n],
        constraint_upper_bounds=uc[:n],
        row_types=row_t[:n].astype("U1"),
        rhs=rhs[:n],
        variable_lower_bounds=lv[:m],
        variable_upper_bounds=uv[:m],
        variable_types=var_t[:m].astype("U1"),
        problem_name=lib.mps_problem_name(h).decode("utf-8", "replace"),
        objective_name=lib.mps_objective_name(h).decode("utf-8", "replace"),
        variable_names=[
            lib.mps_var_name(h, j).decode("utf-8", "replace")
            for j in range(m)
        ],
        row_names=[
            lib.mps_row_name(h, i).decode("utf-8", "replace")
            for i in range(n)
        ],
    )
    lib.mps_free(h)
    return prob


def parse_mps_native(path: str,
                     fixed_format: bool = False) -> OptimizationProblem:
    """Parse an MPS file with the native C++ parser."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native MPS parser not built (run: make -C cpp)"
        )
    h = lib.mps_parse(str(path).encode(), 1 if fixed_format else 0)
    prob = _extract(lib, h)
    prob.validate()
    return prob


def parse_mps_string_native(text: str,
                            fixed_format: bool = False) -> OptimizationProblem:
    """Parse MPS text with the native C++ parser."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native MPS parser not built (run: make -C cpp)"
        )
    h = lib.mps_parse_string(text.encode(), 1 if fixed_format else 0)
    prob = _extract(lib, h)
    prob.validate()
    return prob
