"""MPS parser tests against the reference dataset suite
(/root/reference/datasets/linear_programming/{good,bad}-mps-*, afiro).

Mirrors the reference parser test strategy (SURVEY.md section 2.5: extensive
negative tests via bad-mps-*.mps).
"""

import math

import numpy as np
import pytest

from cuopt_tpu.io import parse_mps
from cuopt_tpu.utils.errors import MpsParseError

INF = math.inf

BAD_FILES = [
    "bad-mps-1.mps", "bad-mps-2.mps", "bad-mps-3.mps", "bad-mps-4.mps",
    "bad-mps-5.mps", "bad-mps-6.mps", "bad-mps-7.mps", "bad-mps-9.mps",
    "bad-mps-10.mps", "bad-mps-11.mps", "bad-mps-12.mps", "bad-mps-13.mps",
    "bad-mps-14.mps", "bad-mps-15.mps", "bad-mps-bound-1.mps",
    "bad-mps-bound-2.mps",
]

GOOD_FILES = [
    "good-mps-1.mps", "good-mps-1-clrf.mps", "good-mps-1-comments.mps",
    "free-format-mps-1.mps", "good-fixed-mps-2.mps", "good-max.mps",
    "good-mps-fixed-empty-name.mps", "good-mps-fixed-no-name.mps",
    "good-mps-fixed-ranges.mps", "good-mps-free-ranges.mps",
    "good-mps-fixed-var.mps", "good-mps-free-var.mps",
    "good-mps-lower-bound-inf-var.mps", "good-mps-upper-bound-inf-var.mps",
    "good-mps-rhs-cost.mps", "good-mps-some-var-bounds.mps",
    "good-mps-fixed-two-objectives.mps",
    "good-mps-fixed-two-objectives-objname.mps",
    "good-mps-fixed-two-objectives-objname-next-line.mps",
    "afiro_original.mps",
]


BACKENDS = ["python", "native"]


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("fname", BAD_FILES)
def test_bad_mps_rejected(lp_datasets, fname, backend):
    with pytest.raises(MpsParseError):
        parse_mps(str(lp_datasets / fname), backend=backend)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("fname", GOOD_FILES)
def test_good_mps_accepted(lp_datasets, fname, backend):
    p = parse_mps(str(lp_datasets / fname), backend=backend)
    assert p.n_variables >= 0
    p.validate()


@pytest.mark.parametrize("fname", GOOD_FILES)
def test_native_matches_python(lp_datasets, fname):
    """The C++ parser (cpp/mps_parser/) and the Python fallback must
    produce identical problems on the whole good-file suite."""
    a = parse_mps(str(lp_datasets / fname), backend="python")
    b = parse_mps(str(lp_datasets / fname), backend="native")
    assert a.n_variables == b.n_variables
    assert a.n_constraints == b.n_constraints
    assert a.nnz == b.nnz
    np.testing.assert_array_equal(a.offsets, b.offsets)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.values, b.values)
    np.testing.assert_allclose(
        a.objective_coefficients, b.objective_coefficients
    )
    assert a.objective_offset == b.objective_offset
    assert a.maximize == b.maximize
    np.testing.assert_allclose(
        a.constraint_lower_bounds, b.constraint_lower_bounds
    )
    np.testing.assert_allclose(
        a.constraint_upper_bounds, b.constraint_upper_bounds
    )
    np.testing.assert_allclose(
        a.variable_lower_bounds, b.variable_lower_bounds
    )
    np.testing.assert_allclose(
        a.variable_upper_bounds, b.variable_upper_bounds
    )
    assert list(a.variable_types) == list(b.variable_types)
    assert a.variable_names == b.variable_names
    assert a.row_names == b.row_names
    assert a.objective_name == b.objective_name


def test_good_mps_1_contents(lp_datasets):
    p = parse_mps(str(lp_datasets / "good-mps-1.mps"))
    assert p.n_variables == 2
    assert p.n_constraints == 2
    np.testing.assert_allclose(p.objective_coefficients, [0.2, 0.1])
    A = p.to_dense()
    np.testing.assert_allclose(A, [[3.0, 4.0], [2.7, 10.1]])
    np.testing.assert_allclose(p.constraint_upper_bounds, [5.4, 4.9])
    assert np.all(np.isneginf(p.constraint_lower_bounds))
    np.testing.assert_allclose(p.variable_lower_bounds, [0.0, 0.0])
    assert np.all(np.isposinf(p.variable_upper_bounds))
    assert not p.maximize


def test_afiro_contents(lp_datasets):
    p = parse_mps(str(lp_datasets / "afiro_original.mps"))
    assert p.n_variables == 32
    assert p.n_constraints == 27
    assert p.nnz == 83  # afiro: 88 nnz minus 5 objective entries


def test_ranges_semantics(lp_datasets):
    p = parse_mps(str(lp_datasets / "good-mps-fixed-ranges.mps"))
    # ROW1 (L, rhs 5.4, range 4.2) -> [1.2, 5.4]
    # ROW2 (G, rhs 1.5, range 3.4) -> [1.5, 4.9]
    # ROW3 (E, rhs 9.5, range -1.6) -> [7.9, 9.5]
    # ROW4 (E, rhs 3.5, range 3.4) -> [3.5, 6.9]
    # ROW5 (L, rhs 3.9, range 0) -> [3.9, 3.9]
    # ROW6 (G, rhs 4.9, range 0) -> [4.9, 4.9]
    np.testing.assert_allclose(
        p.constraint_lower_bounds, [1.2, 1.5, 7.9, 3.5, 3.9, 4.9]
    )
    np.testing.assert_allclose(
        p.constraint_upper_bounds, [5.4, 4.9, 9.5, 6.9, 3.9, 4.9]
    )


def test_free_var_bounds(lp_datasets):
    p = parse_mps(str(lp_datasets / "good-mps-free-var.mps"))
    assert p.variable_lower_bounds[0] == -INF
    assert p.variable_upper_bounds[0] == INF
    assert p.variable_lower_bounds[1] == 0.0


def test_objective_offset_from_rhs(lp_datasets):
    p = parse_mps(str(lp_datasets / "good-mps-rhs-cost.mps"))
    assert p.objective_offset == -5.0


def test_maximize(lp_datasets):
    p = parse_mps(str(lp_datasets / "good-max.mps"))
    assert p.maximize


def test_objname_selects_objective(lp_datasets):
    p = parse_mps(
        str(lp_datasets / "good-mps-fixed-two-objectives-objname.mps")
    )
    assert p.objective_name == "COST6679327"
    # COST6679327 has no column entries, so objective is all zeros
    np.testing.assert_allclose(p.objective_coefficients, [0.0, 0.0])


def test_two_objectives_first_wins(lp_datasets):
    p = parse_mps(str(lp_datasets / "good-mps-fixed-two-objectives.mps"))
    assert p.objective_name == "COST"
    np.testing.assert_allclose(p.objective_coefficients, [0.2, 0.1])


def test_integer_marker(tmp_path):
    mps = """NAME intcase
ROWS
 N  obj
 L  c1
COLUMNS
    x1  obj  1.0  c1  1.0
    MARKER1  'MARKER'  'INTORG'
    x2  obj  2.0  c1  1.0
    MARKER2  'MARKER'  'INTEND'
    x3  obj  3.0  c1  1.0
RHS
    rhs  c1  10.0
ENDATA
"""
    f = tmp_path / "int.mps"
    f.write_text(mps)
    p = parse_mps(str(f))
    assert list(p.variable_types) == ["C", "I", "C"]
    assert p.is_mip()
