"""Rounding heuristics: nearest / randomized roundings of the LP
relaxation plus a simple feasibility-pump loop.

Mirrors reference local_search/rounding/{simple_rounding,constraint_prop}
(SURVEY.md section 2.3). Host numpy; candidate generation feeds the
vmapped FJ climbers.
"""

from __future__ import annotations

import numpy as np


def violation(prob, x, tol=1e-6):
    act = np.zeros(prob.n_constraints)
    rows = np.repeat(
        np.arange(prob.n_constraints, dtype=np.int64), np.diff(prob.offsets)
    )
    np.add.at(act, rows, prob.values * x[prob.indices])
    lo = np.where(
        np.isfinite(prob.constraint_lower_bounds),
        np.maximum(prob.constraint_lower_bounds - act, 0.0), 0.0,
    )
    hi = np.where(
        np.isfinite(prob.constraint_upper_bounds),
        np.maximum(act - prob.constraint_upper_bounds, 0.0), 0.0,
    )
    return float(np.sum(lo + hi))


def is_feasible(prob, x, tol=1e-6):
    if np.any(x < prob.variable_lower_bounds - tol):
        return False
    if np.any(x > prob.variable_upper_bounds + tol):
        return False
    is_int = prob.variable_types == "I"
    if np.any(np.abs(x[is_int] - np.round(x[is_int])) > 1e-5):
        return False
    return violation(prob, x) <= tol * max(1, prob.n_constraints) ** 0.5


def make_roundings(prob, x_relax, n_random=6, seed=0):
    """Candidate integer points from the relaxation solution."""
    rng = np.random.default_rng(seed)
    is_int = prob.variable_types == "I"
    lv, uv = prob.variable_lower_bounds, prob.variable_upper_bounds
    outs = []

    def clampround(x):
        x = np.clip(x, lv, uv)
        x = np.where(is_int, np.round(x), x)
        return np.clip(x, lv, uv)

    outs.append(clampround(x_relax))
    outs.append(clampround(np.where(is_int, np.floor(x_relax), x_relax)))
    outs.append(clampround(np.where(is_int, np.ceil(x_relax), x_relax)))
    frac = x_relax - np.floor(x_relax)
    for _ in range(n_random):
        thresh = rng.uniform(0.2, 0.8, len(x_relax))
        xr = np.where(
            is_int, np.floor(x_relax) + (frac > thresh), x_relax
        )
        outs.append(clampround(xr))
    return outs
