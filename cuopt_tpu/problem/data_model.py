"""LP/MIP problem representation.

Mirrors the reference problem layer:
  - `optimization_problem_t` (reference
    cpp/include/cuopt/linear_programming/optimization_problem.hpp:67): CSR
    constraint matrix + objective + bounds + variable types, ranged
    constraints l_c <= Ax <= u_c, variable bounds l_v <= x <= u_v.
  - `mps_data_model_t` (reference
    cpp/libmps_parser/include/mps_parser/mps_data_model.hpp:53): same fields
    host-side with names.

The canonical internal form used by every solver here is the ranged form:

    min/max  c^T x + offset
    s.t.     l_c <= A x <= u_c
             l_v <= x  <= u_v
             x_j integer for j in integer_vars

Row types 'L'/'G'/'E' are translated into (l_c, u_c) with +-inf.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from cuopt_tpu.constants import CUOPT_CONTINUOUS, CUOPT_INTEGER
from cuopt_tpu.utils.errors import ValidationError

INF = math.inf


@dataclass
class OptimizationProblem:
    """Host-side LP/MIP problem in CSR ranged form."""

    # CSR constraint matrix (rows = constraints)
    offsets: np.ndarray = field(default_factory=lambda: np.zeros(1, np.int64))
    indices: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    values: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))
    # objective
    objective_coefficients: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.float64)
    )
    objective_offset: float = 0.0
    objective_scaling_factor: float = 1.0
    maximize: bool = False
    # constraint bounds (ranged form)
    constraint_lower_bounds: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.float64)
    )
    constraint_upper_bounds: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.float64)
    )
    # original row info (kept for reporting / .sol files)
    row_types: np.ndarray = field(default_factory=lambda: np.zeros(0, "U1"))
    rhs: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))
    # variable bounds and types
    variable_lower_bounds: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.float64)
    )
    variable_upper_bounds: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.float64)
    )
    variable_types: np.ndarray = field(default_factory=lambda: np.zeros(0, "U1"))
    # names
    problem_name: str = ""
    objective_name: str = ""
    variable_names: list[str] = field(default_factory=list)
    row_names: list[str] = field(default_factory=list)

    # ------------------------------------------------------------------ sizes
    @property
    def n_constraints(self) -> int:
        return len(self.constraint_lower_bounds)

    @property
    def n_variables(self) -> int:
        return len(self.objective_coefficients)

    @property
    def nnz(self) -> int:
        return len(self.values)

    def is_mip(self) -> bool:
        return bool(np.any(self.variable_types == CUOPT_INTEGER))

    # ------------------------------------------------------------ validation
    def validate(self) -> None:
        """Pre-solve validation, mirroring reference
        cpp/src/utilities/problem_checking.cuh (problem_checking_t):
        CSR size consistency, bounds ordering, NaN checks."""
        n, m = self.n_constraints, self.n_variables
        if len(self.offsets) != n + 1:
            raise ValidationError(
                f"CSR offsets length {len(self.offsets)} != n_constraints+1 ({n + 1})"
            )
        if self.offsets[0] != 0 or self.offsets[-1] != len(self.indices):
            raise ValidationError("CSR offsets must start at 0 and end at nnz")
        if np.any(np.diff(self.offsets) < 0):
            raise ValidationError("CSR offsets must be non-decreasing")
        if len(self.indices) != len(self.values):
            raise ValidationError("CSR indices/values length mismatch")
        if len(self.indices) and (
            self.indices.min() < 0 or self.indices.max() >= m
        ):
            raise ValidationError("CSR column index out of range")
        for name, arr, expect in (
            ("constraint_lower_bounds", self.constraint_lower_bounds, n),
            ("constraint_upper_bounds", self.constraint_upper_bounds, n),
            ("variable_lower_bounds", self.variable_lower_bounds, m),
            ("variable_upper_bounds", self.variable_upper_bounds, m),
            ("objective_coefficients", self.objective_coefficients, m),
        ):
            if len(arr) != expect:
                raise ValidationError(f"{name} length {len(arr)} != {expect}")
            if np.any(np.isnan(arr)):
                raise ValidationError(f"NaN found in {name}")
        if np.any(np.isnan(self.values)):
            raise ValidationError("NaN found in constraint matrix values")
        if np.any(self.variable_lower_bounds > self.variable_upper_bounds):
            raise ValidationError("variable lower bound exceeds upper bound")
        if np.any(self.constraint_lower_bounds > self.constraint_upper_bounds):
            raise ValidationError("constraint lower bound exceeds upper bound")

    # ----------------------------------------------------------- conversions
    def csr_matrix(self):
        """Return (offsets, indices, values) as numpy arrays."""
        return self.offsets, self.indices, self.values

    def to_dense(self) -> np.ndarray:
        A = np.zeros((self.n_constraints, self.n_variables), np.float64)
        for i in range(self.n_constraints):
            s, e = self.offsets[i], self.offsets[i + 1]
            A[i, self.indices[s:e]] += self.values[s:e]
        return A

    @staticmethod
    def from_dense(
        A: np.ndarray,
        c: np.ndarray,
        constraint_lower: np.ndarray,
        constraint_upper: np.ndarray,
        variable_lower: np.ndarray | None = None,
        variable_upper: np.ndarray | None = None,
        maximize: bool = False,
        objective_offset: float = 0.0,
        variable_types: np.ndarray | None = None,
    ) -> "OptimizationProblem":
        A = np.asarray(A, np.float64)
        n, m = A.shape
        mask = A != 0.0
        counts = mask.sum(axis=1)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        indices = np.nonzero(mask)[1].astype(np.int64)
        values = A[mask].astype(np.float64)
        p = OptimizationProblem(
            offsets=offsets,
            indices=indices,
            values=values,
            objective_coefficients=np.asarray(c, np.float64),
            maximize=maximize,
            objective_offset=objective_offset,
            constraint_lower_bounds=np.asarray(constraint_lower, np.float64),
            constraint_upper_bounds=np.asarray(constraint_upper, np.float64),
            variable_lower_bounds=(
                np.zeros(m) if variable_lower is None
                else np.asarray(variable_lower, np.float64)
            ),
            variable_upper_bounds=(
                np.full(m, INF) if variable_upper is None
                else np.asarray(variable_upper, np.float64)
            ),
            variable_types=(
                np.full(m, CUOPT_CONTINUOUS, "U1") if variable_types is None
                else np.asarray(variable_types, "U1")
            ),
            row_types=np.full(n, "E", "U1"),
            rhs=np.zeros(n, np.float64),
            variable_names=[f"x{j}" for j in range(m)],
            row_names=[f"r{i}" for i in range(n)],
        )
        return p


class DataModel:
    """User-facing LP/MIP builder, mirroring the reference Python
    `linear_programming.DataModel` (python/cuopt/cuopt/linear_programming/
    data_model/data_model.py:20, setters :157-449)."""

    def __init__(self):
        self._p = OptimizationProblem()
        self._row_types_set = False

    # --- CSR ---
    def set_csr_constraint_matrix(self, values, indices, offsets):
        self._p.values = np.asarray(values, np.float64)
        self._p.indices = np.asarray(indices, np.int64)
        self._p.offsets = np.asarray(offsets, np.int64)

    def set_constraint_matrix_dense(self, A):
        q = OptimizationProblem.from_dense(
            np.asarray(A),
            np.zeros(np.asarray(A).shape[1]),
            np.zeros(np.asarray(A).shape[0]),
            np.zeros(np.asarray(A).shape[0]),
        )
        self._p.values, self._p.indices, self._p.offsets = (
            q.values, q.indices, q.offsets,
        )

    # --- objective ---
    def set_objective_coefficients(self, c):
        self._p.objective_coefficients = np.asarray(c, np.float64)

    def set_objective_offset(self, off: float):
        self._p.objective_offset = float(off)

    def set_objective_scaling_factor(self, s: float):
        self._p.objective_scaling_factor = float(s)

    def set_maximize(self, maximize: bool):
        self._p.maximize = bool(maximize)

    def set_sense(self, maximize: bool):
        self._p.maximize = bool(maximize)

    # --- constraints: either row_types+rhs(+ranges) or explicit bounds ---
    def set_row_types(self, row_types):
        self._p.row_types = np.asarray(list(row_types), "U1")
        self._row_types_set = True

    def set_constraint_bounds(self, rhs):
        self._p.rhs = np.asarray(rhs, np.float64)

    def set_constraint_lower_bounds(self, lb):
        self._p.constraint_lower_bounds = np.asarray(lb, np.float64)

    def set_constraint_upper_bounds(self, ub):
        self._p.constraint_upper_bounds = np.asarray(ub, np.float64)

    # --- variables ---
    def set_variable_lower_bounds(self, lb):
        self._p.variable_lower_bounds = np.asarray(lb, np.float64)

    def set_variable_upper_bounds(self, ub):
        self._p.variable_upper_bounds = np.asarray(ub, np.float64)

    def set_variable_types(self, types):
        self._p.variable_types = np.asarray(list(types), "U1")

    def set_variable_names(self, names):
        self._p.variable_names = list(names)

    def set_row_names(self, names):
        self._p.row_names = list(names)

    def set_problem_name(self, name: str):
        self._p.problem_name = str(name)

    # --- getters (reference data_model.py parity) ---
    def get_constraint_matrix_values(self):
        return self._p.values

    def get_constraint_matrix_indices(self):
        return self._p.indices

    def get_constraint_matrix_offsets(self):
        return self._p.offsets

    def get_objective_coefficients(self):
        return self._p.objective_coefficients

    def get_objective_offset(self):
        return self._p.objective_offset

    def get_maximize(self):
        return self._p.maximize

    def get_constraint_lower_bounds(self):
        return self._p.constraint_lower_bounds

    def get_constraint_upper_bounds(self):
        return self._p.constraint_upper_bounds

    def get_variable_lower_bounds(self):
        return self._p.variable_lower_bounds

    def get_variable_upper_bounds(self):
        return self._p.variable_upper_bounds

    def get_variable_types(self):
        return self._p.variable_types

    def get_variable_names(self):
        return self._p.variable_names

    def get_row_names(self):
        return self._p.row_names

    # --- finalize ---
    def to_problem(self) -> OptimizationProblem:
        p = self._p
        m = len(p.objective_coefficients)
        n_rows = max(len(p.offsets) - 1, 0)
        if len(p.variable_lower_bounds) == 0:
            p.variable_lower_bounds = np.zeros(m, np.float64)
        if len(p.variable_upper_bounds) == 0:
            p.variable_upper_bounds = np.full(m, INF, np.float64)
        if len(p.variable_types) == 0:
            p.variable_types = np.full(m, CUOPT_CONTINUOUS, "U1")
        if self._row_types_set and len(p.constraint_lower_bounds) == 0:
            lc = np.empty(n_rows, np.float64)
            uc = np.empty(n_rows, np.float64)
            if len(p.rhs) == 0:
                p.rhs = np.zeros(n_rows, np.float64)
            for i, t in enumerate(p.row_types):
                if t == "E":
                    lc[i] = uc[i] = p.rhs[i]
                elif t == "L":
                    lc[i], uc[i] = -INF, p.rhs[i]
                elif t == "G":
                    lc[i], uc[i] = p.rhs[i], INF
                else:
                    raise ValidationError(f"unknown row type {t!r}")
            p.constraint_lower_bounds = lc
            p.constraint_upper_bounds = uc
        if not p.variable_names:
            p.variable_names = [f"x{j}" for j in range(m)]
        if not p.row_names:
            p.row_names = [f"r{i}" for i in range(p.n_constraints)]
        p.validate()
        return p
