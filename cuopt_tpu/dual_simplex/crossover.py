"""Crossover: polish a PDLP interior solution to a basic (vertex)
solution.

Mirrors the reference `crossover()` (cpp/src/dual_simplex/crossover.hpp:38,
status enum :28: OPTIMAL / PRIMAL_FEASIBLE / ...). Strategy here: the
PDLP solution seeds the dual simplex (which starts nonbasics at the
bound nearest the PDLP value and pushes to a vertex); exactness comes
from the simplex, speed from the warm bound placement.
"""

from __future__ import annotations

from cuopt_tpu import constants as C
from cuopt_tpu.utils.logger import get_logger


def crossover(prob, pdlp_raw, settings, timer):
    log = get_logger()
    if prob.n_constraints > 2000 or prob.n_variables > 4000:
        log.info("crossover skipped: problem too large for the dense "
                 "host simplex")
        return pdlp_raw
    try:
        from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

        raw = solve_lp_simplex(prob, settings, timer)
    except Exception as exc:  # noqa: BLE001
        log.warning(f"crossover failed, keeping PDLP solution: {exc}")
        return pdlp_raw
    if raw["status"] != C.CUOPT_TERIMINATION_STATUS_OPTIMAL:
        return pdlp_raw
    raw["solved_by"] = "pdlp+crossover"
    raw["iterations"] = pdlp_raw["iterations"]
    log.info(
        f"crossover: vertex objective {raw['primal_objective']:.10g} "
        f"(PDLP {pdlp_raw['primal_objective']:.10g})"
    )
    return raw
