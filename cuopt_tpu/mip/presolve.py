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


@dataclass
class ProbeResult:
    lv: np.ndarray
    uv: np.ndarray
    infeasible: bool
    n_probed: int
    n_fixed: int
    tightened: int


def probe_variables(
    offsets: np.ndarray,
    indices: np.ndarray,
    values: np.ndarray,
    lc: np.ndarray,
    uc: np.ndarray,
    lv: np.ndarray,
    uv: np.ndarray,
    is_integer: np.ndarray,
    max_probes: int = 64,
    rounds_per_probe: int = 3,
    feas_tol: float = 1e-6,
    int_tol: float = 1e-5,
) -> ProbeResult:
    """Probing on binary/small-domain integer variables (reference
    cpp/src/mip/presolve/multi_probe.cuh `multi_probe_t` :33 +
    probing_cache.cuh): tentatively fix a variable at each of its two
    bound values, propagate, and

      - both branches infeasible -> the problem is infeasible,
      - one branch infeasible    -> fix the variable to the other value,
      - both feasible            -> tighten every variable's bounds to the
                                    union (hull) of the two branch domains.

    Probe candidates are binaries (and 2-value integers) ordered by how
    many constraints they touch — the reference orders by expected impact.
    """
    lv = lv.copy()
    uv = uv.copy()
    span = uv - lv
    binary = is_integer & np.isfinite(lv) & np.isfinite(uv) & \
        (span > int_tol) & (span < 1.0 + int_tol)
    cand = np.flatnonzero(binary)
    if len(cand) == 0:
        return ProbeResult(lv, uv, False, 0, 0, 0)
    # impact order: number of nonzeros in the variable's column
    col_counts = np.zeros(len(lv), np.int64)
    np.add.at(col_counts, indices, 1)
    cand = cand[np.argsort(-col_counts[cand])][:max_probes]

    n_fixed = 0
    tightened = 0
    for j in cand:
        if uv[j] - lv[j] <= int_tol:
            continue  # already fixed by an earlier probe
        branches = []
        infeas = []
        for val in (lv[j], uv[j]):
            lv_b = lv.copy()
            uv_b = uv.copy()
            lv_b[j] = uv_b[j] = val
            r = propagate_bounds(
                offsets, indices, values, lc, uc, lv_b, uv_b,
                is_integer, max_rounds=rounds_per_probe,
                feas_tol=feas_tol, int_tol=int_tol,
            )
            branches.append(r)
            infeas.append(r.infeasible)
        if infeas[0] and infeas[1]:
            return ProbeResult(lv, uv, True, int(np.sum(cand <= j)),
                               n_fixed, tightened)
        if infeas[0] or infeas[1]:
            keep = branches[1] if infeas[0] else branches[0]
            lv, uv = keep.lv.copy(), keep.uv.copy()
            n_fixed += 1
            continue
        # hull of the two feasible branch domains
        hull_lv = np.minimum(branches[0].lv, branches[1].lv)
        hull_uv = np.maximum(branches[0].uv, branches[1].uv)
        t = int(np.sum(hull_lv > lv + 1e-12) +
                np.sum(hull_uv < uv - 1e-12))
        if t:
            tightened += t
            lv = np.maximum(lv, hull_lv)
            uv = np.minimum(uv, hull_uv)
    return ProbeResult(lv, uv, False, len(cand), n_fixed, tightened)
