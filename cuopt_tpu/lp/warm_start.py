"""PDLP warm-start data: full internal solver state export/import.

Role parity with the reference `pdlp_warm_start_data_t`
(cpp/include/cuopt/linear_programming/pdlp/pdlp_warm_start_data.hpp;
populated at pdlp.cu:470-488, consumed via
solver_settings.hpp:138-163): current and averaged primal/dual iterates,
restart snapshots, KKT scores, step size, primal weight and counters.
The state is stored in the solver's scaled space together with the
scaling diagonals, so it is valid for re-solves of the same problem
(matrix unchanged; bounds/objective may move — the scaling depends only
on A). This is also the LP "checkpoint/resume" artifact surfaced by the
server (GET /cuopt/solution/{id}/warmstart in the reference webserver).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class PdlpWarmStartData:
    current_primal_solution: np.ndarray
    current_dual_solution: np.ndarray
    current_ATY: np.ndarray
    current_AX: np.ndarray
    initial_primal_average: np.ndarray
    initial_dual_average: np.ndarray
    average_AX: np.ndarray
    average_ATY: np.ndarray
    last_restart_primal_solution: np.ndarray
    last_restart_dual_solution: np.ndarray
    row_scale: np.ndarray
    col_scale: np.ndarray
    initial_step_size: float
    initial_primal_weight: float
    sum_solution_weight: float
    last_restart_kkt_score: float
    last_candidate_kkt_score: float
    iterations_since_last_restart: int
    total_pdhg_iterations: int
    total_pdlp_iterations: int

    def to_dict(self) -> dict:
        """JSON/msgpack-friendly representation (server transport)."""
        out = {}
        for k, v in self.__dict__.items():
            out[k] = v.tolist() if isinstance(v, np.ndarray) else v
        return out

    @classmethod
    def from_dict(cls, d: dict) -> "PdlpWarmStartData":
        kw = {}
        for f_ in cls.__dataclass_fields__:
            v = d[f_]
            kw[f_] = np.asarray(v, float) if isinstance(v, list) else v
        return cls(**kw)


def capture_warm_start(dev, state) -> PdlpWarmStartData:
    """Snapshot the jitted solver state (device -> host)."""
    g = lambda a: np.asarray(a, float)
    return PdlpWarmStartData(
        current_primal_solution=g(state.x),
        current_dual_solution=g(state.y),
        current_ATY=g(state.aty),
        current_AX=g(state.ax),
        initial_primal_average=g(state.avg_x),
        initial_dual_average=g(state.avg_y),
        average_AX=g(state.avg_ax),
        average_ATY=g(state.avg_aty),
        last_restart_primal_solution=g(state.x_last_restart),
        last_restart_dual_solution=g(state.y_last_restart),
        row_scale=g(dev.row_scale),
        col_scale=g(dev.col_scale),
        initial_step_size=float(state.step_size),
        initial_primal_weight=float(state.primal_weight),
        sum_solution_weight=float(state.sum_weights),
        last_restart_kkt_score=float(state.last_restart_kkt),
        last_candidate_kkt_score=float(state.last_candidate_kkt),
        iterations_since_last_restart=int(state.iters_since_restart),
        total_pdhg_iterations=int(state.total_attempts),
        total_pdlp_iterations=int(state.total_steps),
    )


def restore_state(ws: PdlpWarmStartData, dev, dtype):
    """Rebuild a SolverState from warm-start data for a re-solve.

    The stored iterates live in the scaled space of the ORIGINAL solve;
    if the new device problem uses different scaling diagonals (it should
    not, for the same matrix), the iterates are rebased through user
    space: x_new = x_old * (C_old / C_new).
    """
    import jax.numpy as jnp

    from cuopt_tpu.lp.pdlp import SolverState

    rs_new = np.asarray(dev.row_scale, float)
    cs_new = np.asarray(dev.col_scale, float)
    # x_scaled = x_user / C ; y_scaled = y_user / R (build_device_problem)
    cx = ws.col_scale / cs_new
    ry = ws.row_scale / rs_new
    # (Ax)_user = ax_scaled / R ; (A^T y)_user = aty_scaled / C
    rx = rs_new / ws.row_scale
    cy = cs_new / ws.col_scale

    a = lambda v, dt=dtype: jnp.asarray(v, dt)
    return SolverState(
        x=a(ws.current_primal_solution * cx),
        y=a(ws.current_dual_solution * ry),
        ax=a(ws.current_AX * rx),
        aty=a(ws.current_ATY * cy),
        step_size=a(ws.initial_step_size),
        primal_weight=a(ws.initial_primal_weight),
        sum_weights=a(ws.sum_solution_weight),
        avg_x=a(ws.initial_primal_average * cx),
        avg_y=a(ws.initial_dual_average * ry),
        avg_ax=a(ws.average_AX * rx),
        avg_aty=a(ws.average_ATY * cy),
        x_last_restart=a(ws.last_restart_primal_solution * cx),
        y_last_restart=a(ws.last_restart_dual_solution * ry),
        last_restart_kkt=a(ws.last_restart_kkt_score),
        last_candidate_kkt=a(ws.last_candidate_kkt_score),
        iters_since_restart=jnp.asarray(
            ws.iterations_since_last_restart, jnp.int64
        ),
        total_steps=jnp.asarray(ws.total_pdlp_iterations, jnp.int64),
        total_attempts=jnp.asarray(ws.total_pdhg_iterations, jnp.int64),
        numerical_error=jnp.asarray(False),
    )
