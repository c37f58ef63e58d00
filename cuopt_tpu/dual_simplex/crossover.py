"""Crossover: polish a PDLP interior solution to a basic (vertex)
solution.

Mirrors the reference `crossover()` (cpp/src/dual_simplex/crossover.hpp:38,
status enum :28: OPTIMAL / PRIMAL_FEASIBLE / ...): the interior PDLP
point (x*, y*) IS the input. The native dual simplex receives it as a
crossover hint: nonbasic placements come from the sign of the PDLP
reduced costs d* = c - A^T y*, ties broken toward the bound nearer to
x*_j (cpp/dual_simplex/simplex.cpp InitBasis y_hint branch). Since the
PDLP duals are near-optimal, the placements are near-final and the dual
simplex typically needs few pivots to reach the optimal vertex.
"""

from __future__ import annotations

from cuopt_tpu import constants as C
from cuopt_tpu.utils.logger import get_logger


def crossover(prob, pdlp_raw, settings, timer):
    """Push the PDLP solution in `pdlp_raw` to an exact vertex."""
    log = get_logger()
    try:
        from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

        raw = solve_lp_simplex(
            prob, settings, timer,
            x_hint=pdlp_raw.get("primal_solution"),
            y_hint=pdlp_raw.get("dual_solution"),
            want_vstat=True,
        )
    except Exception as exc:  # noqa: BLE001
        log.warning(f"crossover failed, keeping PDLP solution: {exc}")
        return pdlp_raw
    if raw["status"] != C.CUOPT_TERIMINATION_STATUS_OPTIMAL:
        log.info("crossover did not reach a vertex optimum; keeping "
                 "the PDLP solution")
        return pdlp_raw
    raw["solved_by"] = "pdlp+crossover"
    raw["crossover_iterations"] = raw["iterations"]
    raw["iterations"] = pdlp_raw["iterations"]
    if "warm_start_data" in pdlp_raw:
        raw["warm_start_data"] = pdlp_raw["warm_start_data"]
    if "warm_start_data_fn" in pdlp_raw:
        raw["warm_start_data_fn"] = pdlp_raw["warm_start_data_fn"]
    log.info(
        f"crossover: vertex objective {raw['primal_objective']:.10g} "
        f"in {raw['crossover_iterations']} simplex iterations "
        f"(PDLP {pdlp_raw['primal_objective']:.10g})"
    )
    return raw
