"""Concurrent LP: host dual simplex racing the device PDLP.

Mirrors reference solve.cu run_concurrent :467-537: dual simplex on a
separate thread (std::thread :492), PDLP on the main thread, a shared
atomic halt flag (`global_concurrent_halt` :222) stopping the loser, the
winner's solution returned (status CONCURRENT_LIMIT maps to whoever was
cancelled).

The native ds_solve polls the halt int cooperatively; the PDLP host loop
checks the simplex-finished event between major iterations.
"""

from __future__ import annotations

import ctypes
import math
import threading
import time

from cuopt_tpu import constants as C
from cuopt_tpu.lp.pdlp import PdlpSolver
from cuopt_tpu.utils.logger import get_logger


def run_concurrent(prob, settings, timer):
    log = get_logger()
    halt = ctypes.c_int(0)
    simplex_done = threading.Event()
    simplex_result: dict = {}

    def simplex_thread():
        try:
            from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

            raw = solve_lp_simplex(
                prob, settings, timer, halt=ctypes.byref(halt)
            )
            simplex_result.update(raw)
        except Exception as exc:  # noqa: BLE001 — loser must not crash race
            simplex_result["status"] = \
                C.CUOPT_TERIMINATION_STATUS_NUMERICAL_ERROR
            simplex_result["error"] = str(exc)
        finally:
            simplex_done.set()

    # the sparse-LU simplex scales to large hosts solves; race it always
    # (reference solve.cu:467 runs both legs unconditionally)
    t = threading.Thread(target=simplex_thread, daemon=True)
    t.start()

    solver = PdlpSolver(prob, settings)
    pdlp_raw = None

    # Grace poll BEFORE touching the device: the first major call blocks
    # in the XLA compile (minutes cold via the tunnel), during which a
    # simplex win would sit unnoticed — on small/degenerate LPs (the
    # cases the simplex exists for) that turned a 0.3s win into a
    # minutes-long wall. The reference's two legs are independent threads
    # (solve.cu:467); here the PDLP leg simply yields first.
    grace_end = time.monotonic() + min(
        3.0, 0.2 * settings.time_limit
        if math.isfinite(settings.time_limit) else 3.0,
    )
    while time.monotonic() < grace_end:
        if simplex_done.wait(timeout=0.02):
            break

    def _simplex_won():
        return simplex_done.is_set() and simplex_result.get("status") in (
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
            C.CUOPT_TERIMINATION_STATUS_INFEASIBLE,
            C.CUOPT_TERIMINATION_STATUS_UNBOUNDED,
        )

    if _simplex_won():
        log.info("Concurrent: dual simplex finished first")
        halt.value = 1
        return simplex_result

    # PDLP host loop with an early-exit check on the simplex event: reuse
    # the PdlpSolver internals chunk by chunk.
    import jax.numpy as jnp

    from cuopt_tpu.lp.pdlp import build_device_problem, initial_state

    dev = build_device_problem(
        prob, solver.hp, solver.dtype, settings.operator_kind
    )
    state = initial_state(dev, solver.hp, solver.dtype)
    status = C.CUOPT_TERIMINATION_STATUS_NO_TERMINATION
    use_avg = False
    report = None
    while True:
        if simplex_done.is_set() and simplex_result.get("status") in (
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL,
            C.CUOPT_TERIMINATION_STATUS_INFEASIBLE,
            C.CUOPT_TERIMINATION_STATUS_UNBOUNDED,
        ):
            log.info("Concurrent: dual simplex finished first")
            return simplex_result
        state, report = solver.major_fn(dev, state)
        if bool(report["opt_cur"]) or bool(report["opt_avg"]):
            status = C.CUOPT_TERIMINATION_STATUS_OPTIMAL
            use_avg = bool(report["opt_avg"]) and not bool(
                report["opt_cur"]
            )
            break
        if bool(report["numerical_error"]):
            status = C.CUOPT_TERIMINATION_STATUS_NUMERICAL_ERROR
            break
        if int(report["total_steps"]) >= settings.iteration_limit:
            status = C.CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT
            break
        if timer.expired():
            status = C.CUOPT_TERIMINATION_STATUS_TIME_LIMIT
            break
    halt.value = 1  # stop the simplex
    log.info("Concurrent: PDLP finished first") if status == \
        C.CUOPT_TERIMINATION_STATUS_OPTIMAL else None
    import numpy as np

    info = report["info_avg"] if use_avg else report["info_cur"]
    raw = {
        "status": status,
        "iterations": int(report["total_steps"]),
        "attempts": int(report["total_attempts"]),
        "solve_time": timer.elapsed(),
        "primal_solution": np.asarray(
            report["x_avg"] if use_avg else report["x_cur"]
        ),
        "dual_solution": np.asarray(
            report["y_avg"] if use_avg else report["y_cur"]
        ),
        "reduced_cost": np.asarray(
            report["reduced_cost_avg"] if use_avg
            else report["reduced_cost_cur"]
        ),
        "primal_objective": float(info["primal_obj"]),
        "dual_objective": float(info["dual_obj"]),
        "gap": float(info["gap"]),
        "l2_primal_residual": float(info["l2_primal_res"]),
        "l2_dual_residual": float(info["l2_dual_res"]),
        "linf_primal_residual": float(info["linf_primal_res"]),
        "linf_dual_residual": float(info["linf_dual_res"]),
        "solved_by": "pdlp",
    }
    if dev.inv_col_perm is not None:
        # bandwidth-reordered operator: gather back to user order
        inv_cp = np.asarray(dev.inv_col_perm)
        inv_rp = np.asarray(dev.inv_row_perm)
        raw["primal_solution"] = raw["primal_solution"][inv_cp]
        raw["dual_solution"] = raw["dual_solution"][inv_rp]
        raw["reduced_cost"] = raw["reduced_cost"][inv_cp]
    if prob.maximize:
        raw["primal_objective"] = -raw["primal_objective"]
        raw["dual_objective"] = -raw["dual_objective"]
        raw["dual_solution"] = -raw["dual_solution"]
        raw["reduced_cost"] = -raw["reduced_cost"]
    if settings.crossover and status == \
            C.CUOPT_TERIMINATION_STATUS_OPTIMAL:
        from cuopt_tpu.dual_simplex.crossover import crossover

        raw = crossover(prob, raw, settings, timer)
    return raw
