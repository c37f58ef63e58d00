"""MIP presolve: trivial presolve + iterated activity-based bound
propagation.

Mirrors the reference GPU presolve (cpp/src/mip/presolve/:
bounds_presolve.cuh `bound_presolve_t`, trivial_presolve.cuh). Host
numpy implementation — presolve runs once per solve (and per B&B node for
probing) over the CSR arrays; vectorized numpy is adequate at this stage
and keeps it reusable from the host-side branch & bound. A jitted variant
can drop in later for very large instances.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

INF = np.inf


@dataclass
class PresolveResult:
    lv: np.ndarray
    uv: np.ndarray
    infeasible: bool
    n_rounds: int
    tightened: int


def propagate_bounds(
    offsets: np.ndarray,
    indices: np.ndarray,
    values: np.ndarray,
    lc: np.ndarray,
    uc: np.ndarray,
    lv: np.ndarray,
    uv: np.ndarray,
    is_integer: np.ndarray,
    max_rounds: int = 10,
    feas_tol: float = 1e-6,
    int_tol: float = 1e-5,
) -> PresolveResult:
    """Iterated activity-based bound propagation (reference
    bounds_presolve.cuh: min/max constraint activity from variable bounds,
    implied variable bounds from the residual activity, integer rounding).
    """
    n = len(lc)
    # BIG-clamp trick: represent infinite bounds as +-BIG for activity
    # arithmetic; implied bounds beyond BIG_IMPLIED are treated as infinite
    BIG = 1e20
    BIG_IMPLIED = 1e18
    lv = np.clip(lv.copy(), -BIG, BIG)
    uv = np.clip(uv.copy(), -BIG, BIG)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    cols = indices
    vals = values
    pos = vals > 0
    tightened_total = 0

    for rnd in range(max_rounds):
        # per-entry activity contributions with current bounds
        lo_contrib = np.where(pos, vals * lv[cols], vals * uv[cols])
        hi_contrib = np.where(pos, vals * uv[cols], vals * lv[cols])
        min_act = np.zeros(n)
        max_act = np.zeros(n)
        np.add.at(min_act, rows, lo_contrib)
        np.add.at(max_act, rows, hi_contrib)

        # a min_act within BIG_IMPLIED of +-BIG means "effectively infinite"
        min_act_fin = np.abs(min_act) < BIG_IMPLIED
        max_act_fin = np.abs(max_act) < BIG_IMPLIED
        if np.any(min_act_fin & np.isfinite(uc) & (min_act > uc + feas_tol)):
            return PresolveResult(lv, uv, True, rnd + 1, tightened_total)
        if np.any(max_act_fin & np.isfinite(lc) & (max_act < lc - feas_tol)):
            return PresolveResult(lv, uv, True, rnd + 1, tightened_total)

        # implied bound for entry (i, j):
        #   a>0: x_j <= (uc_i - (min_act_i - a*lv_j)) / a
        #        x_j >= (lc_i - (max_act_i - a*uv_j)) / a
        #   a<0: mirrored
        resid_min = min_act[rows] - lo_contrib  # activity without entry
        resid_max = max_act[rows] - hi_contrib
        with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
            ub_from_uc = np.where(
                pos, (uc[rows] - resid_min) / vals,
                (lc[rows] - resid_max) / vals,
            )
            lb_from_lc = np.where(
                pos, (lc[rows] - resid_max) / vals,
                (uc[rows] - resid_min) / vals,
            )
        # only usable when the governing bound is finite and the residual
        # activity is genuinely finite
        gov_ub_ok = np.where(
            pos,
            np.isfinite(uc[rows]) & (np.abs(resid_min) < BIG_IMPLIED),
            np.isfinite(lc[rows]) & (np.abs(resid_max) < BIG_IMPLIED),
        )
        gov_lb_ok = np.where(
            pos,
            np.isfinite(lc[rows]) & (np.abs(resid_max) < BIG_IMPLIED),
            np.isfinite(uc[rows]) & (np.abs(resid_min) < BIG_IMPLIED),
        )
        ub_from_uc = np.where(
            gov_ub_ok & np.isfinite(ub_from_uc), ub_from_uc, BIG
        )
        lb_from_lc = np.where(
            gov_lb_ok & np.isfinite(lb_from_lc), lb_from_lc, -BIG
        )

        new_uv = uv.copy()
        new_lv = lv.copy()
        np.minimum.at(new_uv, cols, ub_from_uc)
        np.maximum.at(new_lv, cols, lb_from_lc)
        # integer rounding
        new_uv = np.where(
            is_integer & (np.abs(new_uv) < BIG_IMPLIED),
            np.floor(new_uv + int_tol), new_uv,
        )
        new_lv = np.where(
            is_integer & (np.abs(new_lv) < BIG_IMPLIED),
            np.ceil(new_lv - int_tol), new_lv,
        )
        # keep only genuine tightenings (avoid loosening)
        new_uv = np.minimum(new_uv, uv)
        new_lv = np.maximum(new_lv, lv)
        if np.any(new_lv > new_uv + feas_tol):
            return PresolveResult(new_lv, new_uv, True, rnd + 1,
                                  tightened_total)
        changed = int(np.sum(new_uv < uv - 1e-12) +
                      np.sum(new_lv > lv + 1e-12))
        tightened_total += changed
        lv, uv = new_lv, new_uv
        if changed == 0:
            break
    # clamp tiny inversions from rounding
    mid = (lv + uv) / 2
    bad = lv > uv
    lv = np.where(bad, mid, lv)
    uv = np.where(bad, mid, uv)
    # restore infinities
    lv = np.where(lv <= -BIG_IMPLIED, -INF, lv)
    uv = np.where(uv >= BIG_IMPLIED, INF, uv)
    return PresolveResult(lv, uv, False, rnd + 1, tightened_total)


def trivial_round_fixed(lv, uv, is_integer, int_tol=1e-5):
    """Variables with lv == uv are fixed (reference trivial_presolve.cuh
    fixes and compacts; we keep shapes and just report the mask)."""
    return np.isclose(lv, uv, atol=int_tol)
