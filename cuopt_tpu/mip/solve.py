"""MIP solve orchestration.

Mirrors reference cpp/src/mip/solve.cu (`run_mip` :67, `solve_mip` :155)
and solver.cu (`run_solver` :84): scaling/presolve, then GPU heuristics
running alongside a host B&B with incumbent exchange both ways. Here the
heuristic engine (roundings + vmapped feasibility jump) runs on-device
and the B&B drives device LP relaxations; incumbents flow through
`BranchAndBound.set_incumbent` / solution callbacks.
"""

from __future__ import annotations

import math

import numpy as np

from cuopt_tpu import constants as C
from cuopt_tpu.lp.settings import MIPSolverSettings, PDLPSolverSettings
from cuopt_tpu.lp.solution import Solution
from cuopt_tpu.mip.presolve import propagate_bounds
from cuopt_tpu.mip.rounding import (
    bounds_repair_rounding,
    constraint_prop_rounding,
    is_feasible,
    make_roundings,
)
from cuopt_tpu.utils.logger import get_logger, solve_log_context
from cuopt_tpu.utils.timer import Timer


def _internal_minimize(prob):
    """Return a minimize-orientation copy (maximize handled by negation,
    like the device problem build)."""
    if not prob.maximize:
        return prob, 1.0
    q = type(prob)(
        offsets=prob.offsets, indices=prob.indices, values=prob.values,
        objective_coefficients=-prob.objective_coefficients,
        objective_offset=-prob.objective_offset,
        maximize=False,
        constraint_lower_bounds=prob.constraint_lower_bounds,
        constraint_upper_bounds=prob.constraint_upper_bounds,
        row_types=prob.row_types, rhs=prob.rhs,
        variable_lower_bounds=prob.variable_lower_bounds,
        variable_upper_bounds=prob.variable_upper_bounds,
        variable_types=prob.variable_types,
        variable_names=prob.variable_names, row_names=prob.row_names,
    )
    return q, -1.0


def solve_mip(prob, settings: MIPSolverSettings | None = None) -> Solution:
    settings = settings or MIPSolverSettings()
    log = get_logger()
    with solve_log_context(settings.log_file or None,
                           settings.log_to_console):
        prob.validate()
        timer = Timer(settings.time_limit)
        raw = _run_mip(prob, settings, timer, log)
        sol = Solution(prob, raw)
        if settings.solution_file:
            sol.write_to_sol_file(settings.solution_file)
        log.info(
            f"MIP solve done: status={sol.get_termination_reason()} "
            f"obj={raw.get('primal_objective', float('nan')):.10g} "
            f"bound={raw.get('solution_bound', float('nan')):.10g} "
            f"nodes={raw.get('nodes', 0)} time={timer.elapsed():.2f}s"
        )
        return sol


def _make_raw(prob, sign, x, obj, bound, status, nodes=0, iters=0,
              timer=None):
    is_int = prob.variable_types == "I"
    if x is not None:
        x = np.asarray(x, float)
        x = np.where(is_int, np.round(x), x)
    gap = math.inf
    if x is not None and math.isfinite(bound):
        gap = abs(obj - bound) / max(abs(obj), 1e-10)
    return {
        "status": status,
        "iterations": iters,
        "attempts": 0,
        "nodes": nodes,
        "solve_time": timer.elapsed() if timer else 0.0,
        "primal_solution": x if x is not None else np.zeros(
            prob.n_variables
        ),
        "dual_solution": None,
        "reduced_cost": None,
        "primal_objective": sign * obj if x is not None else math.nan,
        "dual_objective": sign * bound if math.isfinite(bound)
        else math.nan,
        "gap": gap,
        "mip_gap": gap,
        "solution_bound": sign * bound if math.isfinite(bound)
        else math.nan,
        "l2_primal_residual": 0.0,
        "l2_dual_residual": 0.0,
        "linf_primal_residual": 0.0,
        "linf_dual_residual": 0.0,
    }


def _run_mip(prob, settings, timer, log):
    import jax.numpy as jnp

    from cuopt_tpu.lp.pdlp import PdlpSolver
    from cuopt_tpu.mip.branch_and_bound import BranchAndBound
    from cuopt_tpu.mip.feasibility_jump import run_feasibility_jump

    pint, sign = _internal_minimize(prob)
    is_int = pint.variable_types == "I"
    m, n = pint.n_variables, pint.n_constraints

    # ---- trivial cases ----
    if m == 0 or n == 0:
        from cuopt_tpu.lp.solve import _solve_no_constraints

        raw = _solve_no_constraints(prob)
        raw["mip_gap"] = 0.0
        raw["solution_bound"] = raw["primal_objective"]
        raw["nodes"] = 0
        return raw

    # ---- presolve: bound propagation ----
    pres = propagate_bounds(
        pint.offsets, pint.indices, pint.values,
        pint.constraint_lower_bounds, pint.constraint_upper_bounds,
        pint.variable_lower_bounds, pint.variable_upper_bounds,
        is_int, max_rounds=10,
        int_tol=settings.tolerances.integrality_tolerance,
    )
    if pres.infeasible:
        return _make_raw(
            prob, sign, None, math.nan, -math.inf,
            C.CUOPT_TERIMINATION_STATUS_INFEASIBLE, timer=timer,
        )
    pint.variable_lower_bounds = pres.lv
    pint.variable_upper_bounds = pres.uv

    # ---- presolve: probing on binaries (reference multi_probe.cuh) ----
    probe_cache = None
    if not timer.expired():
        from cuopt_tpu.mip.presolve import probe_variables

        n_bin = int(np.sum(is_int & np.isfinite(pres.lv)
                           & np.isfinite(pres.uv)
                           & (pres.uv - pres.lv <= 1.0 + 1e-9)))
        if 0 < n_bin:
            pr = probe_variables(
                pint.offsets, pint.indices, pint.values,
                pint.constraint_lower_bounds,
                pint.constraint_upper_bounds,
                pres.lv, pres.uv, is_int,
                max_probes=min(64, max(4, int(2e6) // max(1, pint.nnz))),
                int_tol=settings.tolerances.integrality_tolerance,
            )
            if pr.infeasible:
                return _make_raw(
                    prob, sign, None, math.nan, -math.inf,
                    C.CUOPT_TERIMINATION_STATUS_INFEASIBLE, timer=timer,
                )
            if pr.n_fixed or pr.tightened:
                log.debug(
                    f"probing: {pr.n_probed} probed, {pr.n_fixed} fixed, "
                    f"{pr.tightened} bounds tightened"
                )
            pint.variable_lower_bounds = pr.lv
            pint.variable_upper_bounds = pr.uv
            pres.lv, pres.uv = pr.lv, pr.uv
            probe_cache = pr.cache

    # trivial presolve: eliminate fixed variables + compact the CSR
    # (reference trivial_presolve.cuh), then solve the reduced MIP and
    # postsolve the assignment back to user space
    from cuopt_tpu.mip.presolve import eliminate_fixed

    red = eliminate_fixed(
        pint, pres.lv, pres.uv,
        settings.tolerances.integrality_tolerance,
    )
    if red is not None:
        import copy as _copy

        sub = _copy.copy(settings)
        sub.initial_solutions = [
            red.project(x0) for x0 in settings.initial_solutions
            if len(np.asarray(x0)) == m
        ]
        sub.mip_callbacks = [
            (lambda cb: lambda xr, obj: cb(red.postsolve(xr), obj))(cb)
            for cb in settings.mip_callbacks
        ]
        log.debug(
            f"trivial presolve: eliminated {int(red.fixed.sum())} fixed "
            f"variables ({m} -> {len(red.keep)})"
        )
        raw = _run_mip(red.problem, sub, timer, log)
        x_red = raw.get("primal_solution")
        has_x = x_red is not None and not math.isnan(
            raw.get("primal_objective", math.nan)
        )
        out = _make_raw(
            prob, sign,
            red.postsolve(x_red) if has_x else None,
            raw.get("primal_objective", math.nan) if has_x else math.nan,
            raw.get("solution_bound", math.nan)
            if raw.get("solution_bound") is not None
            and not math.isnan(raw.get("solution_bound", math.nan))
            else -math.inf,
            raw["status"], nodes=raw.get("nodes", 0),
            iters=raw.get("iterations", 0), timer=timer,
        )
        return out

    # all variables fixed by presolve?
    if np.all(pres.lv >= pres.uv - 1e-9):
        x = (pres.lv + pres.uv) / 2
        x = np.where(is_int, np.round(x), x)
        if is_feasible(pint, x):
            obj = float(pint.objective_coefficients @ x
                        + pint.objective_offset)
            return _make_raw(
                prob, sign, x, obj, obj,
                C.CUOPT_TERIMINATION_STATUS_OPTIMAL, timer=timer,
            )
        return _make_raw(
            prob, sign, None, math.nan, -math.inf,
            C.CUOPT_TERIMINATION_STATUS_INFEASIBLE, timer=timer,
        )

    # ---- population + heuristic engine, BEFORE the root LP ----
    # The FJ engine thread starts first so its XLA compile overlaps the
    # host simplex root (compiles release the GIL) and the climbers get
    # the WHOLE solve duration — in r04 the engine started after the
    # root relaxation and its 2.6s one-shot budget was all compile,
    # which is how cod105's optimum-12 incumbent regressed to 0.
    import threading

    from cuopt_tpu.mip.population import Population, run_diversity_loop

    pop = Population(
        pint, int_tol=settings.tolerances.integrality_tolerance
    )
    pop.callbacks = list(settings.mip_callbacks)
    for x0 in settings.initial_solutions:
        x0 = np.asarray(x0, float)
        if len(x0) == m:
            x0 = np.where(is_int, np.round(x0), x0)
            pop.add(x0)
    incumbent, incumbent_obj = None, math.inf
    # pre-root seeds: bound midpoints + random roundings (x_relax-based
    # roundings are added once the root finishes)
    lv0 = np.where(np.isfinite(pres.lv), pres.lv, 0.0)
    uv0 = np.where(np.isfinite(pres.uv), pres.uv,
                   np.maximum(lv0, 0.0) + 1.0)
    mid = np.clip((lv0 + uv0) / 2, pres.lv, pres.uv)
    starts = make_roundings(pint, mid, n_random=5)
    for xr in starts:
        if is_feasible(pint, xr):
            obj = float(pint.objective_coefficients @ xr
                        + pint.objective_offset)
            pop.add(xr)
            if obj < incumbent_obj:
                incumbent, incumbent_obj = xr, obj
    if pop.best is not None and pop.best[0] < incumbent_obj:
        incumbent_obj, incumbent = pop.best

    want_fj = m > 20 or incumbent is None
    dtype = jnp.float64 if settings.dtype == "float64" else jnp.float32
    from cuopt_tpu.mip.rounding import lp_completion

    mixed = bool(is_int.any()) and not bool(is_int.all())

    # The FJ engine is BUILT AND COMPILED IN THE FOREGROUND (right
    # after the root relaxation), then stepped continuously by a
    # background worker thread for the rest of the solve: chunk-stepped
    # climbers with incumbent-aware reseeding, the reference's
    # persistent heuristic GPU stream (mip/solver.cu:125-190). Stepping
    # releases the GIL during device chunks, so the host tree search
    # keeps the foreground. (In r05 the build itself ran in the thread
    # and the GIL-heavy trace starved behind B&B node churn — on 50v-10
    # the engine came up at 38.9s of a 90s budget.) Results are
    # injected through the (thread-safe) population and
    # bnb.set_incumbent.
    heur_stop = threading.Event()
    heur_done = threading.Event()  # set once the FJ program is compiled
    inject_box = {"bnb": None, "x_relax": None}

    def _push(x, obj):
        if heur_stop.is_set():
            return
        pop.add(x)
        b = inject_box.get("bnb")
        if b is not None:
            b.set_incumbent(x, obj)

    def _harvest(out):
        if out is None:
            return
        xfj, objfj = out
        objfj_total = objfj + float(pint.objective_offset)
        xfj = np.where(is_int, np.round(xfj), xfj)
        if is_feasible(pint, xfj):
            # on mixed instances, the climber's continuous part is
            # whatever the jumps left it at — the LP completion of
            # its integer pattern is the exact best version
            if mixed and not timer.expired():
                xc, objc = lp_completion(pint, xfj, timer,
                                         time_cap=2.0)
                if xc is not None and objc < objfj_total:
                    xfj, objfj_total = xc, objc
            _push(xfj, objfj_total)
            log.debug(
                f"[{timer.elapsed():.1f}s] fj incumbent "
                f"{objfj_total:.6g}"
            )
        else:
            log.debug(
                f"[{timer.elapsed():.1f}s] fj candidate "
                f"{objfj_total:.6g} failed exact recheck"
            )

    def _build_engine(fj_starts, platform="auto"):
        from cuopt_tpu.mip.feasibility_jump import FjEngine, fj_platform

        if platform == "auto":
            platform = fj_platform(pint)
        try:
            log.debug(f"[{timer.elapsed():.1f}s] fj build starting "
                      f"({platform or 'device'})")
            eng = FjEngine(pint, fj_starts[:8], dtype=dtype,
                           platform=platform)
            log.debug(f"[{timer.elapsed():.1f}s] fj engine built")
            # the warmup chunk pays the XLA compile — and can already
            # contain the best solution (cod105's optimum falls out of
            # the FIRST 64 steps), so harvest it too
            _harvest(eng.step())
        except Exception as e:  # must never kill the solve
            log.warning(f"feasibility jump engine failed: {e}")
            return None
        log.debug(f"[{timer.elapsed():.1f}s] fj engine compiled")
        return eng

    def run_stepping_loop(eng):
        try:
            pumped = False
            last_inc = math.inf
            since_reseed = 0
            while not heur_stop.is_set() and not timer.expired():
                # warm-migration: the host fast-start engine hands its
                # batch to the device engine once its program is warm
                dev_eng = inject_box.pop("device_eng", None)
                if dev_eng is not None and \
                        dev_eng.device.platform != eng.device.platform:
                    try:
                        dev_eng.adopt_batch(eng)
                        eng = dev_eng
                        log.debug(
                            f"[{timer.elapsed():.1f}s] fj migrated to "
                            f"{eng.device.platform}"
                        )
                    except Exception as e:
                        log.debug(f"fj migration failed: {e}")
                try:
                    out = eng.step()
                except Exception as e:
                    log.warning(f"feasibility jump step failed: {e}")
                    break
                since_reseed += 1
                _harvest(out)
                # feasibility pump once, when FJ can't reach feasibility
                # (reference local_search/feasibility_pump/)
                x_rel = inject_box.get("x_relax")
                if not pumped and pop.best is None and \
                        eng.chunks >= 24 and x_rel is not None:
                    pumped = True
                    from cuopt_tpu.mip.feasibility_pump import (
                        feasibility_pump,
                    )

                    r = timer.remaining()
                    fp_budget = 5.0 if not math.isfinite(r) \
                        else min(0.3 * r, 15.0)
                    try:
                        xfp, objfp, found = feasibility_pump(
                            pint, x_rel, fp_budget,
                            int_tol=settings.tolerances
                            .integrality_tolerance,
                            dtype=settings.dtype,
                        )
                        if found:
                            _push(xfp, objfp)
                    except Exception as e:
                        log.warning(f"feasibility pump failed: {e}")
                # once the root relaxation lands, restart part of the
                # batch from its roundings (even when infeasible — the
                # relaxation neighborhood is where FJ repairs fastest)
                seeds = inject_box.pop("seeds", None)
                if seeds:
                    try:
                        for t, xs in enumerate(seeds[:3]):
                            eng.reseed(xs, n_replace=1)
                    except Exception as e:
                        log.debug(f"fj seed inject failed: {e}")
                # incumbent-aware restarts: when the pool's best moved
                # (B&B or recombination found something) or the climbers
                # have gone stale, restart the worst climbers from
                # perturbations of the incumbent
                best = pop.best
                if best is not None and (
                    best[0] < last_inc - 1e-9 or since_reseed >= 64
                ):
                    last_inc = best[0]
                    since_reseed = 0
                    try:
                        eng.reseed(best[1])
                    except Exception as e:
                        log.debug(f"fj reseed failed: {e}")
                if eng.chunks % 64 == 0:
                    log.debug(
                        f"[{timer.elapsed():.1f}s] fj chunks="
                        f"{eng.chunks} best={eng.pushed_obj:.6g}"
                    )
        finally:
            heur_done.set()

    heur_th = None  # started right after the root relaxation

    # ---- root LP relaxation ----
    # When the instance fits the native-simplex gate, the root is solved
    # EXACTLY by the host dual simplex (reference root bounds are exact
    # dual simplex, dual_simplex/branch_and_bound.hpp:45). This both
    # yields a finite root bound on free-variable instances (where the
    # Lagrangian safe bound of a PDLP dual degenerates to -inf) and
    # avoids per-dispatch device latency on small MIPs.
    root = None
    root_bound = -math.inf
    simplex_stalled = False
    fits_simplex = (
        pint.n_constraints <= 20_000 and pint.n_variables <= 40_000
        and pint.nnz <= 2_000_000
    )
    if fits_simplex:
        try:
            from cuopt_tpu.dual_simplex import is_available
            from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

            if is_available():
                s0 = PDLPSolverSettings()
                # hard-capped budget: a degenerate root LP (set covering
                # etc.) can stall the dual simplex for the WHOLE limit
                # (cod105 burned 25% of the clock in r04); if the root
                # doesn't finish inside this slice, the nodes won't
                # either — mark the engine stalled and run the tree on
                # batched PDLP relaxations instead
                rem = timer.remaining()
                s0.time_limit = min(
                    max(0.1 * rem, 2.0) if math.isfinite(rem) else 15.0,
                    15.0,
                )
                root = solve_lp_simplex(pint, s0, timer)
                log.debug(
                    f"[{timer.elapsed():.1f}s] root simplex: "
                    f"status={root['status']} "
                    f"iters={root.get('iterations')}"
                )
                if root["status"] == \
                        C.CUOPT_TERIMINATION_STATUS_OPTIMAL:
                    root_bound = float(root["dual_objective"])
                elif root["status"] != \
                        C.CUOPT_TERIMINATION_STATUS_INFEASIBLE:
                    root = None  # unbounded/limit: fall back to PDLP
                    simplex_stalled = True
        except Exception as e:
            log.debug(f"simplex root failed, falling back to PDLP: {e}")
            root = None
    if root is None:
        lp_settings = PDLPSolverSettings()
        lp_settings.method = C.CUOPT_METHOD_PDLP
        lp_settings.set_optimality_tolerance(1e-6)
        lp_settings.detect_infeasibility = True
        lp_settings.iteration_limit = 100_000
        if math.isfinite(timer.remaining()):
            lp_settings.time_limit = max(0.25 * timer.remaining(), 1.0)
        lp_settings.dtype = settings.dtype
        root = PdlpSolver(pint, lp_settings).run()
        # Rigorous root bound: a PDLP dual is only approximately
        # feasible, so dual_objective cannot gate the MIP gap (same
        # treatment as node bounds)
        from cuopt_tpu.mip.branch_and_bound import safe_dual_bound

        if root["status"] == C.CUOPT_TERIMINATION_STATUS_OPTIMAL:
            root_bound = safe_dual_bound(
                pint, root.get("dual_solution"),
                pint.variable_lower_bounds, pint.variable_upper_bounds,
            )
    if root["status"] == C.CUOPT_TERIMINATION_STATUS_INFEASIBLE:
        return _make_raw(
            prob, sign, None, math.nan, -math.inf,
            C.CUOPT_TERIMINATION_STATUS_INFEASIBLE, timer=timer,
        )
    x_relax = root["primal_solution"]
    inject_box["x_relax"] = x_relax
    log.debug(f"[{timer.elapsed():.1f}s] root relaxation done, "
              f"bound={root_bound:.6g}")

    # ---- relaxation-guided roundings ----
    # constraint-prop rounding + bounds-repaired variants (reference
    # local_search/rounding/{constraint_prop,bounds_repair}.cu)
    relax_starts = make_roundings(pint, x_relax, n_random=5)
    cp = constraint_prop_rounding(pint, x_relax)
    if cp is not None:
        relax_starts.append(cp)
    for xr in list(relax_starts[:3]):
        relax_starts.append(bounds_repair_rounding(pint, xr))
    for xr in relax_starts:
        if is_feasible(pint, xr):
            obj = float(pint.objective_coefficients @ xr
                        + pint.objective_offset)
            pop.add(xr)
            if obj < incumbent_obj:
                incumbent, incumbent_obj = xr, obj
    # mixed-integer instances: LP-complete the leading roundings (fix
    # the integer pattern, solve the continuous LP exactly) — FJ's
    # single-variable jumps cannot set the continuous side well
    # (reference relaxed_lp.cuh:50 run_lp_with_vars_fixed)
    if mixed:
        for xr in relax_starts[:3]:
            if timer.expired():
                break
            xc, objc = lp_completion(pint, xr, timer)
            if xc is not None:
                pop.add(xc)
                if objc < incumbent_obj:
                    incumbent, incumbent_obj = xc, objc
                log.debug(
                    f"[{timer.elapsed():.1f}s] lp completion {objc:.6g}"
                )
    if pop.best is not None and pop.best[0] < incumbent_obj:
        incumbent_obj = pop.best[0]
        incumbent = pop.best[1]
    inject_box["seeds"] = relax_starts[:3]

    # ---- heuristic engine: build + remote warmup overlap ----
    # The first execution of the climber program pays a heavy-tailed
    # remote warmup (2s..70s observed for the SAME cached program on
    # this tunnel), so the warmup chunk is dispatched as early as
    # possible and the worker blocks GIL-FREE in the device sync while
    # the host runs GMI cut rounds and the B&B. Only the Python TRACING
    # needs an exclusive window (it starved behind B&B node churn in
    # r05: engine up at 38.9s of a 90s budget), hence the short bounded
    # wait. Starting from the RELAXATION-guided roundings matters: on
    # 50v-10 the very first chunk lands within 2% of the final
    # incumbent.
    if want_fj and not timer.expired():
        def build_and_step():
            import jax as _jax

            eng = _build_engine(relax_starts + starts)
            heur_done.set()
            if eng is None:
                return
            if eng.device.platform == "cpu" and \
                    _jax.default_backend() != "cpu":
                # warm the device twin in parallel; the stepping loop
                # migrates onto it when its first chunk returns
                def warm_device():
                    dev = _build_engine(relax_starts + starts,
                                        platform=None)
                    if dev is not None:
                        inject_box["device_eng"] = dev

                threading.Thread(
                    target=warm_device, daemon=True,
                    name="cuopt-mip-fj-warm",
                ).start()
            if not heur_stop.is_set():
                run_stepping_loop(eng)

        heur_th = threading.Thread(
            target=build_and_step, daemon=True,
            name="cuopt-mip-heuristics",
        )
        heur_th.start()
        rem = timer.remaining()
        head = min(0.15 * rem, 6.0) if math.isfinite(rem) else 6.0
        heur_done.wait(timeout=max(head, 1.0))
    else:
        heur_done.set()

    if settings.heuristics_only:
        # evolutionary loop only (reference heuristics_only,
        # mip/solver_settings.hpp); the FJ engine keeps climbing in the
        # background while the main thread recombines
        rem = timer.remaining()
        heur_done.wait(timeout=max(rem, 0.0) if math.isfinite(rem)
                       else 600.0)
        rem = timer.remaining()
        if math.isfinite(rem) and rem > 0.2:
            run_diversity_loop(
                pint, pop, timer, rem * 0.9, bnb=None,
                rng=np.random.default_rng(0), dtype=settings.dtype,
                x_relax=x_relax,
            )
        elif not math.isfinite(rem):
            run_diversity_loop(
                pint, pop, timer, 30.0, bnb=None,
                rng=np.random.default_rng(0), dtype=settings.dtype,
                x_relax=x_relax,
            )
        heur_stop.set()
        if heur_th is not None:
            heur_th.join(timeout=15.0)
        if pop.best is not None:
            incumbent_obj, incumbent = pop.best
        if incumbent is not None:
            status = C.CUOPT_TERIMINATION_STATUS_FEASIBLE_FOUND
            return _make_raw(prob, sign, incumbent, incumbent_obj,
                             root_bound, status, timer=timer)
        return _make_raw(
            prob, sign, None, math.nan, root_bound,
            C.CUOPT_TERIMINATION_STATUS_TIME_LIMIT, timer=timer,
        )

    # ---- root GMI cuts (mip/cuts.py): lift the tree's LP bound ----
    # The FJ engine keeps stepping in the background (device chunks
    # release the GIL; the cut rounds are host simplex + numpy).
    prob_tree = pint
    if root is not None and not simplex_stalled and \
            math.isfinite(root_bound) and not timer.expired():
        from cuopt_tpu.mip.cuts import strengthen_root

        try:
            rem = timer.remaining()
            cut_timer = Timer(min(0.2 * rem, 20.0)
                              if math.isfinite(rem) else 20.0)
            prob_cut, cut_bound, n_cuts, x_cut = strengthen_root(
                pint, settings, cut_timer, log,
            )
            if prob_cut is not None and cut_bound > root_bound:
                prob_tree = prob_cut
                root_bound = cut_bound
                log.debug(
                    f"[{timer.elapsed():.1f}s] root cuts: {n_cuts} gmi "
                    f"rows, bound -> {root_bound:.6g}"
                )
                if x_cut is not None:
                    # the cut-LP optimum is far closer to integrality
                    # than the plain root — better RINS/rounding guide
                    x_relax = x_cut
                    inject_box["x_relax"] = x_cut
                    inject_box["seeds"] = make_roundings(
                        pint, x_cut, n_random=2)[:3]
        except Exception as e:  # pragma: no cover
            log.warning(f"root cut strengthening failed: {e}")

    # ---- branch & bound interleaved with the evolutionary loop ----
    # (reference mip/solver.cu:125-190 runs B&B via std::async alongside
    # GPU heuristics — two CUDA streams. On a host-driven tree the same
    # two loops fight over the GIL and the device queue, so here they
    # COOPERATIVELY time-slice in one thread: a B&B slice is guaranteed
    # its share before each heuristic slice, which provably advances the
    # tree (round-3 threaded version starved to nodes=0 under load).
    import time as _time

    bnb = BranchAndBound(prob_tree, settings, probe_cache=probe_cache)
    if simplex_stalled:
        # the root stalled inside its simplex budget (degenerate LP);
        # node relaxations would stall the same way — run the tree on
        # batched PDLP relaxations instead
        bnb.use_simplex = False
    bnb.solution_callbacks.append(lambda x, o: pop.add(x, from_external=True))
    best0 = pop.best
    if best0 is not None and best0[0] < incumbent_obj:
        incumbent_obj, incumbent = best0
    if incumbent is not None:
        bnb.set_incumbent(incumbent, incumbent_obj)
    if math.isfinite(root_bound):
        bnb.best_bound = root_bound
    inject_box["bnb"] = bnb  # late heuristic results flow straight in
    res = None
    rem = timer.remaining()
    concurrent = math.isfinite(rem) and rem > 3.0 and m > 20
    try:
        if concurrent:
            slice_no = 1
            heur_share = 0.35  # fraction of each round spent evolving
            # bound-progress tracking: when the tree stops raising the
            # global bound (50v-10: +70 over 9k nodes while the primal
            # side was still descending), shift the clock toward the
            # heuristics — the reference gets this balance for free from
            # two independent streams; a time-sliced host must adapt
            bound_hist = []
            while not timer.expired():
                bnb_slice = min(4.0, max(0.5, timer.remaining() * 0.5))
                bnb_slice *= (1.0 - heur_share) / 0.65
                done = bnb.step(
                    timer, deadline=_time.monotonic() + bnb_slice
                )
                bound_hist.append(bnb.best_bound)
                if len(bound_hist) >= 6 and math.isfinite(bound_hist[-1]):
                    prev = bound_hist[-6]
                    scale = max(1.0, abs(incumbent_obj)
                                if math.isfinite(incumbent_obj)
                                else abs(bound_hist[-1]))
                    stalled = (bound_hist[-1] - prev) < 1e-4 * scale
                    heur_share = 0.6 if stalled else 0.35
                if pop.best is not None:
                    bnb.set_incumbent(pop.best[1], pop.best[0])
                if done:
                    break
                heur_slice = min(
                    bnb_slice * heur_share / max(1 - heur_share, 1e-9),
                    max(timer.remaining(), 0.0),
                )
                # host-only moves (LP completions, line segments) run
                # from the first slice; the FJ-based recombiners join
                # once the engine's XLA compile is done (a cold remote
                # compile can take minutes and must not gate the pure
                # host heuristics — 50v-10 got ZERO diversity rounds in
                # 90s this way)
                if heur_slice > 0.05 and pop.best is not None:
                    run_diversity_loop(
                        pint, pop, timer, heur_slice, bnb=bnb,
                        rng=np.random.default_rng(slice_no),
                        dtype=settings.dtype, x_relax=x_relax,
                        use_fj=heur_done.is_set(),
                    )
                slice_no += 1
                if pop.best is not None:
                    bnb.set_incumbent(pop.best[1], pop.best[0])
            res = bnb.result()
        else:
            res = bnb.solve(timer)
    except Exception as e:  # pragma: no cover
        log.warning(f"branch and bound failed: {e}")
        res = None
    finally:
        heur_stop.set()  # discard late heuristic pushes
        # join the worker before returning: a daemon thread killed at
        # interpreter exit mid-device-call aborts the process ("FATAL:
        # exception not rethrown" from the runtime's pthread teardown)
        if heur_th is not None:
            heur_th.join(timeout=15.0)
    if res is None:
        res = dict(status=C.CUOPT_TERIMINATION_STATUS_TIME_LIMIT,
                   incumbent=bnb.incumbent, incumbent_obj=bnb.incumbent_obj,
                   best_bound=max(root_bound, bnb.best_bound),
                   nodes=bnb.nodes_explored,
                   simplex_iters=bnb.simplex_iters)
    status = res["status"]
    x = res["incumbent"]
    obj = res["incumbent_obj"]
    bound = res["best_bound"]
    if pop.best is not None and (x is None or pop.best[0] < obj - 1e-12):
        obj, x = pop.best
        if status != C.CUOPT_TERIMINATION_STATUS_OPTIMAL:
            status = C.CUOPT_TERIMINATION_STATUS_FEASIBLE_FOUND
    if x is None and incumbent is not None:
        x, obj = incumbent, incumbent_obj
        status = C.CUOPT_TERIMINATION_STATUS_FEASIBLE_FOUND
    return _make_raw(
        prob, sign, x, obj, bound, status,
        nodes=res["nodes"], iters=res["simplex_iters"], timer=timer,
    )
