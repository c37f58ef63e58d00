"""MIP benchmark + quality ratchet (reference
cpp/tests/mip/miplib_test.cu:52-60: MIPLIB instances solved to expected
cost within a time limit).

Runs every MIP under --dir, records objective/bound/gap per instance,
and compares against the frozen per-instance baseline
(scripts/mip_baseline.json = the best objective/gap any prior round
achieved). With --check, exits non-zero if any instance's objective or
gap regressed beyond tolerance — the round-over-round gate VERDICT r04
asked for after cod105's optimum-12 incumbent silently regressed to 0.

tests/test_mip_ratchet.py applies the same comparison to the committed
MIP_latest.json artifact, so the regression gate runs in CI without
re-solving.
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "mip_baseline.json"
)

# statuses treated as "has a proven answer" for ratchet purposes
_OPTIMAL = 1
_INFEASIBLE = 3


def compare_to_baseline(results, baseline, rel_tol=1e-6, gap_slack=0.02):
    """Return a list of regression strings (empty = pass).

    A regression is: a worse primal objective (internal minimize — the
    runner stores objectives in the USER orientation, so the baseline
    carries the sense), a lost proven-optimal status, or a MIP gap more
    than `gap_slack` absolute above the frozen gap.
    """
    problems = []
    for r in results:
        name = r.get("instance")
        b = baseline.get(name)
        if not b or not r.get("mip"):
            continue
        sense = b.get("sense", "min")
        sgn = 1.0 if sense == "min" else -1.0
        if b.get("status") == _OPTIMAL and r.get("status") != _OPTIMAL:
            problems.append(
                f"{name}: proven-optimal status lost "
                f"(now {r.get('status')})"
            )
        bo, ro = b.get("objective"), r.get("objective")
        if bo is not None and ro is not None and not (
            isinstance(ro, str) or math.isnan(ro)
        ):
            tol = rel_tol * max(1.0, abs(bo))
            if sgn * ro > sgn * bo + tol:
                problems.append(
                    f"{name}: objective regressed {ro:.6g} vs frozen "
                    f"{bo:.6g} ({sense})"
                )
        bg, rg = b.get("mip_gap"), r.get("mip_gap")
        if bg is not None and rg is not None and math.isfinite(bg):
            if not math.isfinite(rg) or rg > bg + gap_slack:
                problems.append(
                    f"{name}: gap regressed {rg:.4g} vs frozen {bg:.4g}"
                )
    return problems


def main():
    from scripts.benchmark_lp import solve_one

    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/reference/datasets/mip")
    ap.add_argument("--glob", default="*.mps")
    ap.add_argument("--time-limit", type=float, default=90.0)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "MIP_latest.json"))
    ap.add_argument("--check", action="store_true",
                    help="exit 1 on any ratchet regression")
    ap.add_argument("--update-baseline", action="store_true",
                    help="fold improvements into the frozen baseline")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.dir, args.glob)))
    files = [f for f in files if "infeas" not in os.path.basename(f)
             or "minrep" in os.path.basename(f)]
    results = []
    for f in files:
        t0 = time.time()
        r = solve_one(f, args.time_limit, 1e-4, None)
        r["wall_s"] = round(time.time() - t0, 2)
        results.append(r)
        print(json.dumps(r), flush=True)

    baseline = {}
    if os.path.exists(BASELINE_PATH):
        baseline = json.load(open(BASELINE_PATH))
    problems = compare_to_baseline(results, baseline)

    summary = {
        "instances": len(results),
        "solved_optimal": sum(1 for r in results
                              if r.get("status") == _OPTIMAL),
        "time_limit_s": args.time_limit,
        "ratchet_regressions": problems,
        "results": results,
    }
    json.dump(summary, open(args.out, "w"), indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "results"}))

    if args.update_baseline:
        new = dict(baseline)
        for r in results:
            if not r.get("mip"):
                continue
            name = r["instance"]
            b = new.get(name)
            sense = (b or {}).get("sense", "min")
            sgn = 1.0 if sense == "min" else -1.0
            obj = r.get("objective")
            better = (
                b is None
                or (obj is not None and b.get("objective") is not None
                    and sgn * obj < sgn * b["objective"] - 1e-9)
            )
            if better or (b and r.get("status") == _OPTIMAL
                          and b.get("status") != _OPTIMAL):
                new[name] = {
                    "sense": sense,
                    "status": r.get("status"),
                    "objective": obj,
                    "mip_gap": r.get("mip_gap"),
                }
            elif b is not None and r.get("mip_gap") is not None and \
                    b.get("mip_gap") is not None and \
                    math.isfinite(r["mip_gap"]) and \
                    r["mip_gap"] < b["mip_gap"] - 1e-12:
                nb = dict(b)
                nb["mip_gap"] = r["mip_gap"]
                new[name] = nb
        json.dump(new, open(BASELINE_PATH, "w"), indent=1)
        print(f"baseline updated: {BASELINE_PATH}", file=sys.stderr)

    if args.check and problems:
        for p in problems:
            print("RATCHET REGRESSION:", p, file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
