"""Batch LP solve.

Reference: cython_solve.cu `call_batch_solve` :264-290 — one CUDA stream
+ raft handle per LP, OpenMP over problems with a memory-capped thread
count. TPU design: same-shape problems are STACKED and solved by ONE
vmapped PDLP major-iteration kernel — the natural TPU analogue of
streams is a single fused program over a batch axis (SIMD over problems
on the MXU/VPU instead of SIMT streams). Each problem carries its own
step size, primal weight, restart bookkeeping and termination flags;
the host loop snapshots a problem's solution the first major iteration
it terminates and keeps the batch running until every member is done
(or limits hit).

Problems whose shapes differ, or that are too large for the stacked
dense operator, fall back to sequential `solve_lp` (each already
jit-cached by shape).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from cuopt_tpu import constants as C
from cuopt_tpu.lp.solution import Solution
from cuopt_tpu.lp.solve import solve_lp

# size threshold below which the stacked operator is simply DENSE;
# larger same-shape members batch via stacked BlockBand (identical
# sparsity pattern, e.g. B&B node relaxations) or common-width ELL
# (arbitrary patterns). Reference batch semantics: arbitrary LPs,
# cython_solve.cu:264-290, guidance faq.rst:332.
_BATCH_DENSE_LIMIT = 1 << 21
# stacked-ELL memory guard (elements across the whole batch)
_BATCH_ELL_LIMIT = 1 << 27


def _groupable(prob, settings):
    return (
        prob.n_constraints > 0
        and prob.n_variables > 0
        and settings.warm_start_data is None
        and settings.initial_primal_solution is None
        and settings.initial_dual_solution is None
        and not getattr(settings, "crossover", False)
    )


@lru_cache(maxsize=16)
def _batch_major_fn(cfg):
    import dataclasses

    import jax

    from cuopt_tpu.lp.pdlp import _cached_major_fn

    # the fused Pallas pass is a per-problem kernel; under vmap the
    # stacked einsum path is the right program (batched matmuls)
    cfg = dataclasses.replace(cfg, fused_kernel="off")
    major = _cached_major_fn(cfg)  # jitted; grab its wrapped fn
    inner = getattr(major, "__wrapped__", major)
    return jax.jit(jax.vmap(inner))


def batch_solve(probs, settings, mesh=None) -> list[Solution]:
    """Solve a list of LPs; same-shape members are vmapped into one
    compiled program (reference BatchSolve, solver/solver.py:101).

    mesh: optional jax.sharding.Mesh — the stacked batch axis is then
    SHARDED across the mesh devices (data-parallel node relaxations;
    BASELINE.json distribution axis 2: "branch-and-bound node batches
    across chips")."""
    from cuopt_tpu.lp.settings import PDLPSolverSettings

    settings = settings or PDLPSolverSettings()
    results: list[Solution | None] = [None] * len(probs)

    # group by shape
    groups: dict[tuple[int, int], list[int]] = {}
    for i, p in enumerate(probs):
        if _groupable(p, settings):
            groups.setdefault(
                (p.n_constraints, p.n_variables), []
            ).append(i)

    for shape, idxs in groups.items():
        if len(idxs) < 2:
            continue
        try:
            batch_results = _solve_stacked(
                [probs[i] for i in idxs], settings, mesh=mesh
            )
        except Exception:  # noqa: BLE001 — robust fallback to sequential
            continue
        for i, sol in zip(idxs, batch_results):
            results[i] = sol

    for i, p in enumerate(probs):
        if results[i] is None:
            results[i] = solve_lp(p, settings)
    return results


def _solve_stacked(probs, settings, mesh=None):
    import jax
    import jax.numpy as jnp

    from cuopt_tpu.lp.hyper_params import PRESETS
    from cuopt_tpu.lp.pdlp import (
        PdlpSolver,
        build_device_problem,
        initial_state,
    )
    from cuopt_tpu.utils.timer import Timer

    B = len(probs)
    solver0 = PdlpSolver(probs[0], settings)
    cfg, hp, dtype = solver0.cfg, solver0.hp, solver0.dtype
    timer = Timer(settings.time_limit)

    kind = _pick_batch_kind(probs)
    # mesh sharding pads the batch to a device multiple by duplicating
    # the last member (duplicates solved redundantly, results dropped)
    n_dup = 0
    if mesh is not None and mesh.devices.size > 1:
        D = int(mesh.devices.size)
        n_dup = (-B) % D
        probs = list(probs) + [probs[-1]] * n_dup
        B = len(probs)
    devs, states = [], []
    for p in probs:
        dev = build_device_problem(p, hp, dtype, kind)
        devs.append(dev)
        states.append(initial_state(dev, hp, dtype))
    if kind == "ell":
        devs = _normalize_ell_widths(devs)
    dev_b = jax.tree.map(lambda *xs: jnp.stack(xs), *devs)
    state_b = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    if n_dup or (mesh is not None and mesh.devices.size > 1):
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]

        def commit(x):
            spec = P(*((axis,) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        dev_b = jax.tree.map(commit, dev_b)
        state_b = jax.tree.map(commit, state_b)
    fn = _batch_major_fn(cfg)

    t = settings.tolerances
    needed_streak = 1 if settings.strict_infeasibility else 2
    done = np.zeros(B, bool)
    statuses = np.full(B, C.CUOPT_TERIMINATION_STATUS_NO_TERMINATION)
    snapshots: list[dict | None] = [None] * B
    inf_streak = np.zeros(B, int)
    unb_streak = np.zeros(B, int)

    while True:
        state_b, report = fn(dev_b, state_b)
        opt_cur = np.asarray(report["opt_cur"])
        opt_avg = np.asarray(report["opt_avg"])
        numerical = np.asarray(report["numerical_error"])
        it = int(np.asarray(report["total_steps"]).max())
        if settings.detect_infeasibility:
            inf_streak = np.where(
                np.asarray(report["primal_infeasible"]), inf_streak + 1, 0
            )
            unb_streak = np.where(
                np.asarray(report["dual_infeasible"]), unb_streak + 1, 0
            )
        newly = ~done & (
            opt_cur | opt_avg | numerical
            | (inf_streak >= needed_streak)
            | (unb_streak >= needed_streak)
        )
        hit_limits = it >= settings.iteration_limit or timer.expired()
        if newly.any() or hit_limits:
            for b in np.flatnonzero(newly if not hit_limits
                                    else (newly | ~done)):
                if numerical[b]:
                    st = C.CUOPT_TERIMINATION_STATUS_NUMERICAL_ERROR
                elif opt_cur[b] or opt_avg[b]:
                    st = C.CUOPT_TERIMINATION_STATUS_OPTIMAL
                elif inf_streak[b] >= needed_streak:
                    st = C.CUOPT_TERIMINATION_STATUS_INFEASIBLE
                elif unb_streak[b] >= needed_streak:
                    st = C.CUOPT_TERIMINATION_STATUS_UNBOUNDED
                elif it >= settings.iteration_limit:
                    st = C.CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT
                else:
                    st = C.CUOPT_TERIMINATION_STATUS_TIME_LIMIT
                statuses[b] = st
                use_avg = bool(opt_avg[b]) and not bool(opt_cur[b])
                snapshots[b] = _extract_one(report, b, use_avg, st,
                                            timer)
                done[b] = True
        if done.all():
            break
    out = []
    for p, raw in zip(probs, snapshots):
        if p.maximize:  # undo the internal minimize transform
            raw["primal_objective"] = -raw["primal_objective"]
            raw["dual_objective"] = -raw["dual_objective"]
            raw["dual_solution"] = -raw["dual_solution"]
            raw["reduced_cost"] = -raw["reduced_cost"]
        out.append(Solution(p, raw))
    return out


def _extract_one(report, b, use_avg, status, timer):
    which = "avg" if use_avg else "cur"
    info = {k: float(np.asarray(v)[b])
            for k, v in report[f"info_{which}"].items()}
    return {
        "status": status,
        "iterations": int(np.asarray(report["total_steps"])[b]),
        "attempts": int(np.asarray(report["total_attempts"])[b]),
        "solve_time": timer.elapsed(),
        "primal_solution": np.asarray(report[f"x_{which}"][b]),
        "dual_solution": np.asarray(report[f"y_{which}"][b]),
        "reduced_cost": np.asarray(report[f"reduced_cost_{which}"][b]),
        "primal_objective": info["primal_obj"],
        "dual_objective": info["dual_obj"],
        "gap": info["gap"],
        "l2_primal_residual": info["l2_primal_res"],
        "l2_dual_residual": info["l2_dual_res"],
        "linf_primal_residual": info["linf_primal_res"],
        "linf_dual_residual": info["linf_dual_res"],
        "solved_by": "pdlp_batch",
    }


def _pick_batch_kind(probs):
    """Stacked operator for a same-shape batch: dense when small;
    BlockBand when every member shares ONE sparsity pattern (identical
    static window metadata stacks trivially — the B&B node-relaxation
    case); else common-width ELL."""
    p0 = probs[0]
    if p0.n_constraints * p0.n_variables <= _BATCH_DENSE_LIMIT:
        return "dense"
    same_pattern = all(
        p.nnz == p0.nnz
        and np.array_equal(p.offsets, p0.offsets)
        and np.array_equal(p.indices, p0.indices)
        for p in probs[1:]
    )
    if same_pattern:
        return "blockband"
    total_ell = 0
    for p in probs:
        wr = int(np.max(np.diff(p.offsets), initial=1))
        total_ell += p.n_constraints * wr * 2
    if total_ell <= _BATCH_ELL_LIMIT:
        return "ell"
    raise ValueError("batch too large for stacked sparse operators")


def _normalize_ell_widths(devs):
    """Pad every member's ELL arrays to the batch-wide max widths so the
    pytrees stack (padded entries are value 0 / index 0, the EllOp
    convention)."""
    import jax.numpy as jnp

    from cuopt_tpu.sparse.ops import EllOp

    ops = [d.op for d in devs]
    if not all(isinstance(o, EllOp) for o in ops):
        return devs
    wr = max(o.row_vals.shape[1] for o in ops)
    wc = max(o.col_vals.shape[1] for o in ops)

    def pad(a, w):
        return jnp.pad(a, ((0, 0), (0, w - a.shape[1])))

    out = []
    for d, o in zip(devs, ops):
        out.append(d.replace(op=o.replace(
            row_vals=pad(o.row_vals, wr), row_cols=pad(o.row_cols, wr),
            col_vals=pad(o.col_vals, wc), col_rows=pad(o.col_rows, wc),
        )))
    return out
