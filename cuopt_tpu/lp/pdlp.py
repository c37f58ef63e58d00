"""PDLP: restarted primal-dual hybrid gradient LP solver, TPU-native.

Re-implements the reference PDLP solver
(cpp/src/linear_programming/pdlp.cu: run_solver :984, take_step :1188;
pdhg.cu:88-200) as fully-jitted JAX. Design differences from the CUDA
reference, driven by the XLA compilation model:

  - The reference captures the PDHG step in ping-pong CUDA graphs
    (ping_pong_graph.cuh:29) to amortize launch overhead; here the whole
    major iteration (`major_iteration` PDHG steps + termination + restart)
    is ONE jitted function built around `lax.fori_loop`/`lax.while_loop`,
    so XLA fuses the SpMV/projection/reduction pipeline and the host only
    syncs once per major iteration (same cadence as the reference's
    termination readback, pdlp.cu:1081).
  - The adaptive step size inner loop (reference
    step_size_strategy/adaptive_step_size_strategy.hpp:35) is a bounded
    `lax.while_loop` inside the step.
  - Restart bookkeeping (weighted average, KKT scores — reference
    restart_strategy/pdlp_restart_strategy.cuh:42) stays entirely
    on-device.

Problem form (minimize):  min c^T x  s.t.  l_c <= Ax <= u_c,
l_v <= x <= u_v.  The two-sided dual projection is the proximal step of
p(y) = l_c^T y+ - u_c^T y- (see PDLP paper, arXiv:2106.04756).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from cuopt_tpu import constants as C
from cuopt_tpu.lp.hyper_params import (
    PRESETS,
    PdlpHyperParams,
    RESTART_KKT,
    RESTART_NONE,
    RESTART_TRUST_REGION,
)
from cuopt_tpu.lp.settings import PDLPSolverSettings
from cuopt_tpu.sparse import build_operator
from cuopt_tpu.utils.logger import get_logger
from cuopt_tpu.utils.timer import Timer


# ============================================================== device data
@struct.dataclass
class DeviceProblem:
    """Scaled problem + scales + original data, all on device."""

    op: object  # scaled operator (R A C)
    # scaled vectors
    c: jax.Array
    lv: jax.Array
    uv: jax.Array
    lc: jax.Array
    uc: jax.Array
    # finite masks + zero-filled finite bounds (inf-safe arithmetic)
    lv_fin: jax.Array
    uv_fin: jax.Array
    lc_fin: jax.Array
    uc_fin: jax.Array
    lv0: jax.Array
    uv0: jax.Array
    lc0: jax.Array
    uc0: jax.Array
    # original (unscaled) vectors + same masks
    c_orig: jax.Array
    lv_orig: jax.Array
    uv_orig: jax.Array
    lc_orig: jax.Array
    uc_orig: jax.Array
    lv0_orig: jax.Array
    uv0_orig: jax.Array
    lc0_orig: jax.Array
    uc0_orig: jax.Array
    # scaling diagonals: A_scaled = diag(row_scale) A diag(col_scale)
    row_scale: jax.Array
    col_scale: jax.Array
    offset: jax.Array  # objective offset (scalar)
    # bandwidth-reducing permutation absorbed into the problem (None when
    # the operator needed no reordering). The solver runs entirely in
    # permuted space — zero per-iteration gather cost — and the host
    # driver un-permutes the solution vectors at extraction
    # (sparse/reorder.py; the GPU reference needs no analogue since
    # cusparse SpMV is pattern-oblivious).
    row_perm: jax.Array | None = None      # dev row i = user row rp[i]
    inv_row_perm: jax.Array | None = None
    col_perm: jax.Array | None = None
    inv_col_perm: jax.Array | None = None


@struct.dataclass
class SolverState:
    x: jax.Array
    y: jax.Array
    ax: jax.Array
    aty: jax.Array
    step_size: jax.Array
    primal_weight: jax.Array
    # weighted average (restart-to-average)
    sum_weights: jax.Array
    avg_x: jax.Array
    avg_y: jax.Array
    avg_ax: jax.Array
    avg_aty: jax.Array
    # restart bookkeeping
    x_last_restart: jax.Array
    y_last_restart: jax.Array
    last_restart_kkt: jax.Array
    last_candidate_kkt: jax.Array
    iters_since_restart: jax.Array
    # counters
    total_steps: jax.Array  # accepted PDHG steps
    total_attempts: jax.Array  # including step-size rejections
    numerical_error: jax.Array  # bool


@dataclass(frozen=True)
class StaticCfg:
    hp: PdlpHyperParams
    abs_primal: float
    rel_primal: float
    abs_dual: float
    rel_dual: float
    abs_gap: float
    rel_gap: float
    detect_infeasibility: bool = False
    primal_inf_tol: float = 1e-8
    dual_inf_tol: float = 1e-8
    max_step_attempts: int = 64
    # fused Pallas PDHG pass (lp/pdhg_pallas.py): "auto" = on TPU when the
    # operator/dtype supports it; "on" = also in interpreter mode (tests);
    # "off" = always the XLA matvec/rmatvec pair
    fused_kernel: str = "auto"


# ============================================================ residual math
def _lagrangian_info(c, lv0, uv0, lc0, uc0, lv_fin, uv_fin, lc_fin, uc_fin,
                     offset, x, y, activity, aty):
    """Primal/dual objectives, residual norms and gap for an iterate.

    Mirrors reference convergence_information.cu (primal residual =
    constraint-bound violation; dual residual = reduced-cost components not
    attributable to finite variable bounds; dual objective = bound terms,
    utils.cuh:140-185)."""
    viol_low = jnp.where(lc_fin, jnp.maximum(lc0 - activity, 0.0), 0.0)
    viol_high = jnp.where(uc_fin, jnp.maximum(activity - uc0, 0.0), 0.0)
    primal_res = viol_low + viol_high

    r = c - aty  # reduced costs
    rp = jnp.maximum(r, 0.0)
    rm = jnp.maximum(-r, 0.0)
    dual_res = jnp.where(lv_fin, 0.0, rp) + jnp.where(uv_fin, 0.0, rm)

    primal_obj = jnp.dot(c, x) + offset
    yp = jnp.maximum(y, 0.0)
    ym = jnp.maximum(-y, 0.0)
    dual_obj = (
        jnp.sum(jnp.where(lc_fin, lc0 * yp, 0.0)
                - jnp.where(uc_fin, uc0 * ym, 0.0))
        + jnp.sum(jnp.where(lv_fin, lv0 * rp, 0.0)
                  - jnp.where(uv_fin, uv0 * rm, 0.0))
        + offset
    )
    return dict(
        primal_obj=primal_obj,
        dual_obj=dual_obj,
        gap=jnp.abs(primal_obj - dual_obj),
        l2_primal_res=jnp.sqrt(jnp.sum(primal_res * primal_res)),
        l2_dual_res=jnp.sqrt(jnp.sum(dual_res * dual_res)),
        linf_primal_res=jnp.max(primal_res, initial=0.0),
        linf_dual_res=jnp.max(dual_res, initial=0.0),
    )


def _scaled_info(dev: DeviceProblem, x, y, ax, aty):
    return _lagrangian_info(
        dev.c, dev.lv0, dev.uv0, dev.lc0, dev.uc0,
        dev.lv_fin, dev.uv_fin, dev.lc_fin, dev.uc_fin,
        dev.offset, x, y, ax, aty,
    )


def _unscaled_info(dev: DeviceProblem, x, y, ax, aty):
    """Transform scaled iterates to user space and evaluate residuals there.
    x_u = C x, y_u = R y, activity_u = ax / R, (A^T y)_u = aty / C."""
    return _lagrangian_info(
        dev.c_orig, dev.lv0_orig, dev.uv0_orig, dev.lc0_orig, dev.uc0_orig,
        dev.lv_fin, dev.uv_fin, dev.lc_fin, dev.uc_fin,
        dev.offset,
        x * dev.col_scale, y * dev.row_scale,
        ax / dev.row_scale, aty / dev.col_scale,
    )


def _kkt_score(info, omega):
    """KKT score sqrt(w^2 rp^2 + rd^2/w^2 + gap^2) (reference
    pdlp_restart_strategy.cu kernel_compute_kkt_score :367-375)."""
    return jnp.sqrt(
        omega * omega * info["l2_primal_res"] ** 2
        + info["l2_dual_res"] ** 2 / (omega * omega)
        + info["gap"] ** 2
    )


# ================================================================ PDHG step
def _use_fused(dev: DeviceProblem, dtype, cfg: StaticCfg) -> bool:
    """Trace-time choice of the fused Pallas pass (lp/pdhg_pallas.py)."""
    if cfg.fused_kernel == "off":
        return False
    from cuopt_tpu.lp.pdhg_pallas import fused_pass_supported

    if not fused_pass_supported(dev.op, dtype):
        return False
    if cfg.fused_kernel == "on":
        return True
    return jax.default_backend() == "tpu"


def _packed_sums(op, terms):
    """jnp.sum of every term — in ONE all-reduce when the operator is
    mesh-sharded.

    On a mesh, each scalar reduction over a sharded vector emits its own
    all-reduce under GSPMD; the step-size logic needs five of them per
    PDHG step, which dominated the ICI latency model (11 collectives per
    step in WEAKSCALING_r04). Here the local partial sums are stacked
    into one K-vector and psum'd once (the reference's analogue keeps
    these reductions inside one fused CUDA kernel,
    adaptive_step_size_strategy.cu). Replicated terms (x-space vectors
    when n doesn't divide the mesh) contribute sum/D so the psum
    reproduces the plain sum."""
    mesh = getattr(op, "mesh", None)
    if mesh is None:
        return [jnp.sum(t) for t in terms]
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    D = int(mesh.devices.size)
    sharded = [int(t.shape[0]) % D == 0 for t in terms]
    specs = tuple(P(axis) if sh else P() for sh in sharded)
    scales = [1.0 if sh else 1.0 / D for sh in sharded]

    def body(*ts):
        parts = jnp.stack(
            [jnp.sum(t) * sc for t, sc in zip(ts, scales)]
        )
        return jax.lax.psum(parts, axis)

    out = jax.shard_map(
        body, mesh=mesh, in_specs=specs, out_specs=P(),
        check_vma=False,
    )(*terms)
    return [out[i] for i in range(len(terms))]


def _take_step(dev: DeviceProblem, s: SolverState, cfg: StaticCfg):
    """One PDHG step with Malitsky-Pock adaptive step size (reference
    pdlp.cu take_step :1188 + adaptive_step_size_strategy)."""
    hp = cfg.hp
    omega = s.primal_weight
    big = jnp.asarray(jnp.finfo(s.x.dtype).max, s.x.dtype)
    fused = _use_fused(dev, s.x.dtype, cfg)

    def attempt(carry):
        eta = carry[0]
        attempts = carry[7]
        tau = eta / omega
        sigma = eta * omega
        grad = dev.c - s.aty
        x_new = jnp.clip(s.x - tau * grad, dev.lv, dev.uv)
        dx = x_new - s.x
        if fused:
            from cuopt_tpu.lp.pdhg_pallas import fused_row_pass

            # infinite-row sentinel scaled so sigma * sentinel cannot
            # overflow f32 (sigma beyond ~3e8 would turn a 1e30 sentinel
            # into inf and a later inf-inf into NaN); big/8/sigma keeps
            # the product at ~finfo.max/8 — still decisively one-sided
            sent = big / 8.0 / jnp.maximum(sigma, 1.0)
            lc0m = jnp.where(dev.lc_fin, dev.lc0, -sent)
            uc0m = jnp.where(dev.uc_fin, dev.uc0, sent)
            ax_new, y_new, aty_new, inter_raw, dy_dot = fused_row_pass(
                dev.op, x_new, s.ax, s.y, lc0m, uc0m, sigma,
            )
            interaction = jnp.abs(inter_raw)
            movement = 0.5 * omega * jnp.dot(dx, dx) + \
                0.5 / omega * dy_dot
            xx = jnp.dot(x_new, x_new)
            yy = jnp.dot(y_new, y_new)
        elif getattr(dev.op, "halo_meta", None) is not None:
            # single-exchange sharded attempt (sparse/ops.py
            # halo_attempt): 2 ppermutes + 1 packed psum per attempt
            from cuopt_tpu.sparse.ops import halo_attempt

            sent = big / 8.0 / jnp.maximum(sigma, 1.0)
            lc0m = jnp.where(dev.lc_fin, dev.lc0, -sent)
            uc0m = jnp.where(dev.uc_fin, dev.uc0, sent)
            x_new, y_new, ax_new, aty_new, sums = halo_attempt(
                dev.op, s.x, s.aty, dev.c, dev.lv, dev.uv,
                s.ax, s.y, lc0m, uc0m, tau, sigma, omega,
            )
            dxdx, xx, dydy, inter_raw, yy = (
                sums[0], sums[1], sums[2], sums[3], sums[4],
            )
            interaction = jnp.abs(inter_raw)
            movement = 0.5 * omega * dxdx + 0.5 / omega * dydy
        else:
            ax_new = dev.op.matvec(x_new)
            ax_tilde = 2.0 * ax_new - s.ax
            # two-sided dual proximal step
            y_low = jnp.where(
                dev.lc_fin, s.y + sigma * (dev.lc0 - ax_tilde), -big
            )
            y_high = jnp.where(
                dev.uc_fin, s.y + sigma * (dev.uc0 - ax_tilde), big
            )
            y_new = jnp.where(
                y_low > 0.0, y_low, jnp.where(y_high < 0.0, y_high, 0.0)
            )
            aty_new = dev.op.rmatvec(y_new)
            dy = y_new - s.y
            # ALL five scalar reductions of the step (movement dots,
            # interaction, and the nonfinite sentinels) ride one fused
            # all-reduce on a mesh
            dxdx, xx, dydy, inter_raw, yy = _packed_sums(
                dev.op,
                [dx * dx, x_new * x_new, dy * dy,
                 dy * (ax_new - s.ax), y_new * y_new],
            )
            interaction = jnp.abs(inter_raw)
            movement = 0.5 * omega * dxdx + 0.5 / omega * dydy
        eta_limit = jnp.where(
            interaction > 0.0, movement / interaction, big
        )
        valid = eta <= eta_limit
        # iteration counter for the growth/reduction schedule: the current
        # attempt's 1-based global index plus one (PDLP counts iterations
        # from 1 at the first adaptive update, so the first factor is
        # 1 - 2^-0.3, not 0)
        k1 = (s.total_attempts + attempts + 2).astype(s.x.dtype)
        eta_next = jnp.minimum(
            (1.0 - k1 ** (-hp.reduction_exponent)) * eta_limit,
            (1.0 + k1 ** (-hp.growth_exponent)) * eta,
        )
        return (eta_next, x_new, y_new, ax_new, aty_new, eta, valid,
                attempts + 1, xx, yy)

    def cond(carry):
        valid, attempts = carry[6], carry[7]
        return jnp.logical_and(~valid, attempts < cfg.max_step_attempts)

    zero = jnp.zeros((), s.x.dtype)
    init = attempt((s.step_size, s.x, s.y, s.ax, s.aty, s.step_size,
                    jnp.asarray(False), jnp.asarray(0, jnp.int32),
                    zero, zero))
    (eta_next, x_new, y_new, ax_new, aty_new, eta_used, valid, attempts,
     xx_new, yy_new) = jax.lax.while_loop(cond, attempt, init)
    from cuopt_tpu.utils.tracing import debug_assert

    debug_assert(eta_next > 0.0, "PDHG step size must stay positive")

    # weighted average update with weight = accepted step size
    w = eta_used
    sum_w = s.sum_weights + w
    frac = w / sum_w

    def upd(avg, new):
        return avg + frac * (new - avg)

    return s.replace(
        x=x_new, y=y_new, ax=ax_new, aty=aty_new,
        step_size=eta_next,
        sum_weights=sum_w,
        avg_x=upd(s.avg_x, x_new),
        avg_y=upd(s.avg_y, y_new),
        avg_ax=upd(s.avg_ax, ax_new),
        avg_aty=upd(s.avg_aty, aty_new),
        iters_since_restart=s.iters_since_restart + 1,
        total_steps=s.total_steps + 1,
        total_attempts=s.total_attempts + attempts,
        numerical_error=jnp.logical_or(
            s.numerical_error,
            jnp.logical_or(
                ~jnp.isfinite(xx_new), ~jnp.isfinite(yy_new),
            ),
        ),
    )


# ========================================================== infeasibility
def _ray_scores(dev: DeviceProblem, x_ray, y_ray):
    """Infeasibility certificates from ray candidates (reference
    termination_strategy/infeasibility_information.cu: primal/dual ray
    inf-norm normalization, max ray infeasibility, ray linear objective).

    Rays are in user (unscaled) space.
    A valid dual ray certifies primal infeasibility:
      max_dual_ray_infeasibility ~ 0 and dual_ray_objective > 0.
    A valid primal ray certifies dual infeasibility (primal unbounded):
      max_primal_ray_infeasibility ~ 0 and c . x_ray < 0.
    """
    eps = 1e-32
    # --- dual ray ---
    y_norm = jnp.max(jnp.abs(y_ray), initial=0.0)
    yn = y_ray / (y_norm + eps)
    yp = jnp.maximum(yn, 0.0)
    ym = jnp.maximum(-yn, 0.0)
    aty_ray = dev.op.rmatvec(y_ray * dev.row_scale) / dev.col_scale / (
        y_norm + eps
    )
    r = -aty_ray
    rp = jnp.maximum(r, 0.0)
    rm = jnp.maximum(-r, 0.0)
    dual_viol = jnp.maximum(
        jnp.max(jnp.where(dev.lc_fin, 0.0, yp), initial=0.0),
        jnp.max(jnp.where(dev.uc_fin, 0.0, ym), initial=0.0),
    )
    dual_viol = jnp.maximum(
        dual_viol,
        jnp.maximum(
            jnp.max(jnp.where(dev.lv_fin, 0.0, rp), initial=0.0),
            jnp.max(jnp.where(dev.uv_fin, 0.0, rm), initial=0.0),
        ),
    )
    dual_ray_obj = (
        jnp.sum(jnp.where(dev.lc_fin, dev.lc0_orig * yp, 0.0)
                - jnp.where(dev.uc_fin, dev.uc0_orig * ym, 0.0))
        + jnp.sum(jnp.where(dev.lv_fin, dev.lv0_orig * rp, 0.0)
                  - jnp.where(dev.uv_fin, dev.uv0_orig * rm, 0.0))
    )
    # --- primal ray ---
    x_norm = jnp.max(jnp.abs(x_ray), initial=0.0)
    xn = x_ray / (x_norm + eps)
    ax_ray = dev.op.matvec(x_ray / dev.col_scale) / dev.row_scale / (
        x_norm + eps
    )
    both_c = jnp.logical_and(dev.lc_fin, dev.uc_fin)
    row_viol = jnp.where(
        both_c, jnp.abs(ax_ray),
        jnp.where(dev.lc_fin, jnp.maximum(-ax_ray, 0.0),
                  jnp.where(dev.uc_fin, jnp.maximum(ax_ray, 0.0), 0.0)),
    )
    both_v = jnp.logical_and(dev.lv_fin, dev.uv_fin)
    var_viol = jnp.where(
        both_v, jnp.abs(xn),
        jnp.where(dev.lv_fin, jnp.maximum(-xn, 0.0),
                  jnp.where(dev.uv_fin, jnp.maximum(xn, 0.0), 0.0)),
    )
    primal_viol = jnp.maximum(
        jnp.max(row_viol, initial=0.0), jnp.max(var_viol, initial=0.0)
    )
    primal_ray_obj = jnp.dot(dev.c_orig, xn)
    return dict(
        has_dual_ray=y_norm > 0.0,
        max_dual_ray_infeasibility=dual_viol,
        dual_ray_objective=dual_ray_obj,
        has_primal_ray=x_norm > 0.0,
        max_primal_ray_infeasibility=primal_viol,
        primal_ray_objective=primal_ray_obj,
    )


def _infeasibility_flags(dev: DeviceProblem, s: SolverState,
                         cfg: StaticCfg):
    """Evaluate ray candidates: the iterate difference since the last
    restart and the current iterate (divergent iterates align with the
    ray for infeasible problems)."""
    x_cur = s.x * dev.col_scale
    y_cur = s.y * dev.row_scale
    x_diff = (s.x - s.x_last_restart) * dev.col_scale
    y_diff = (s.y - s.y_last_restart) * dev.row_scale
    primal_inf = jnp.asarray(False)
    dual_inf = jnp.asarray(False)
    for xr, yr in ((x_diff, y_diff), (x_cur, y_cur)):
        sc = _ray_scores(dev, xr, yr)
        primal_inf = jnp.logical_or(
            primal_inf,
            jnp.logical_and(
                sc["has_dual_ray"],
                jnp.logical_and(
                    sc["max_dual_ray_infeasibility"] <= cfg.primal_inf_tol,
                    sc["dual_ray_objective"] > 0.0,
                ),
            ),
        )
        dual_inf = jnp.logical_or(
            dual_inf,
            jnp.logical_and(
                sc["has_primal_ray"],
                jnp.logical_and(
                    sc["max_primal_ray_infeasibility"] <= cfg.dual_inf_tol,
                    sc["primal_ray_objective"] < 0.0,
                ),
            ),
        )
    return primal_inf, dual_inf


# ====================================================== trust-region gap
def _localized_gap(dev: DeviceProblem, x, y, ax, aty, omega, xr, yr):
    """Normalized localized duality gap Δ_r(z) at radius
    r = ||z - z_ref||_ω (reference restart_strategy/
    localized_duality_gap_container.cu; PDLP paper trust-region restart).

    Maximizes the linearized gap g^T d over {d : bounds, ||d||_ω <= r}
    with a bisection on the trust-region multiplier (the reference solves
    the same threshold problem on device). Returns Δ_r = g^T d / r.
    All in the scaled space, weights ||z||_ω² = ω||dx||² + ||dy||²/ω.
    """
    big = jnp.asarray(1e30, x.dtype)
    eps = 1e-12
    r2 = omega * jnp.sum((x - xr) ** 2) + jnp.sum((y - yr) ** 2) / omega
    r = jnp.sqrt(r2)

    # primal: maximize (-(c - A^T y))^T dx, dx in [lv - x, uv - x]
    g_x = aty - dev.c
    lo_x = jnp.where(dev.lv_fin, dev.lv0 - x, -big)
    hi_x = jnp.where(dev.uv_fin, dev.uv0 - x, big)

    # dual: supergradient of the bound term q(y) - Ax with q by sign(y);
    # at y == 0 pick the feasible direction with positive gradient
    g_up = jnp.where(dev.lc_fin, dev.lc0 - ax, -big)  # d_y > 0 uses l_c
    g_dn = jnp.where(dev.uc_fin, dev.uc0 - ax, big)   # d_y < 0 uses u_c
    pos = y > eps
    neg = y < -eps
    zero = ~(pos | neg)
    g_y = jnp.where(pos, g_up, jnp.where(neg, g_dn, 0.0))
    lo_y = jnp.where(pos | neg, -big, 0.0)
    hi_y = jnp.where(pos | neg, big, 0.0)
    # at zero: up branch when it gains, else down branch when it gains
    up_gain = zero & dev.lc_fin & (g_up > 0.0)
    dn_gain = zero & ~up_gain & dev.uc_fin & (g_dn < 0.0)
    g_y = jnp.where(up_gain, g_up, jnp.where(dn_gain, g_dn, g_y))
    hi_y = jnp.where(up_gain, big, hi_y)
    lo_y = jnp.where(dn_gain, -big, lo_y)

    def d_of_mu(mu):
        dx = jnp.clip(g_x / (2.0 * mu * omega), lo_x, hi_x)
        dy = jnp.clip(g_y * omega / (2.0 * mu), lo_y, hi_y)
        return dx, dy

    def norm_w(dx, dy):
        return omega * jnp.sum(dx * dx) + jnp.sum(dy * dy) / omega

    # bracket: grow mu until the ball constraint holds
    def grow(carry):
        mu_hi, _ = carry
        dx, dy = d_of_mu(mu_hi)
        return mu_hi * 16.0, norm_w(dx, dy)

    mu_lo = jnp.asarray(1e-16, x.dtype)
    dx0, dy0 = d_of_mu(mu_lo)
    n0 = norm_w(dx0, dy0)
    mu_hi, _ = jax.lax.while_loop(
        lambda c: jnp.logical_and(c[1] > r2, c[0] < 1e24),
        grow, (jnp.asarray(1.0, x.dtype), n0),
    )

    def bisect(_, lohi):
        lo, hi = lohi
        mid = jnp.sqrt(lo * hi)  # geometric: mu spans many decades
        dx, dy = d_of_mu(mid)
        inside = norm_w(dx, dy) <= r2
        return jnp.where(inside, lo, mid), jnp.where(inside, mid, hi)

    # if even mu_lo keeps us inside the ball, the box binds: use d(mu_lo)
    box_binds = n0 <= r2
    lo, hi = jax.lax.fori_loop(0, 40, bisect, (mu_lo, mu_hi))
    dx, dy = d_of_mu(jnp.where(box_binds, mu_lo, hi))
    gain = jnp.dot(g_x, dx) + jnp.dot(g_y, dy)
    return jnp.where(r > 0.0, gain / jnp.maximum(r, eps), jnp.inf)


# ================================================================== restart
def _maybe_restart(dev: DeviceProblem, s: SolverState, cfg: StaticCfg,
                   kkt_cur, kkt_avg):
    """KKT-based restart decision + primal weight update (reference
    pdlp_restart_strategy.cu run_kkt_restart :499-636,
    compute_new_primal_weight_kernel)."""
    hp = cfg.hp
    restart_to_avg = jnp.logical_and(
        kkt_avg < kkt_cur, not hp.never_restart_to_average
    )
    candidate_kkt = jnp.minimum(kkt_cur, kkt_avg) \
        if not hp.never_restart_to_average else kkt_cur

    sufficient = candidate_kkt < (
        hp.sufficient_reduction_for_restart * s.last_restart_kkt
    )
    necessary = jnp.logical_and(
        candidate_kkt < hp.necessary_reduction_for_restart
        * s.last_restart_kkt,
        candidate_kkt > s.last_candidate_kkt,
    )
    if hp.artificial_restart_in_main_loop:
        artificial = s.iters_since_restart.astype(s.x.dtype) >= (
            hp.artificial_restart_threshold
            * s.total_steps.astype(s.x.dtype)
        )
    else:
        artificial = jnp.asarray(False)
    do_restart = jnp.logical_and(
        jnp.logical_or(sufficient, jnp.logical_or(necessary, artificial)),
        s.total_steps >= hp.min_iteration_restart,
    )

    cand_x = jnp.where(restart_to_avg, s.avg_x, s.x)
    cand_y = jnp.where(restart_to_avg, s.avg_y, s.y)
    cand_ax = jnp.where(restart_to_avg, s.avg_ax, s.ax)
    cand_aty = jnp.where(restart_to_avg, s.avg_aty, s.aty)

    # primal weight update from distances traveled since last restart
    eps_guard = 1e-10
    pdist = jnp.sqrt(jnp.sum((cand_x - s.x_last_restart) ** 2))
    ddist = jnp.sqrt(jnp.sum((cand_y - s.y_last_restart) ** 2))
    valid_dist = jnp.logical_and(
        jnp.logical_and(pdist > eps_guard, pdist < 1.0 / eps_guard),
        jnp.logical_and(ddist > eps_guard, ddist < 1.0 / eps_guard),
    )
    theta = hp.primal_weight_update_smoothing
    new_omega = jnp.exp(
        theta * jnp.log(jnp.where(valid_dist, ddist / pdist, 1.0))
        + (1.0 - theta) * jnp.log(s.primal_weight)
    )
    new_omega = jnp.where(valid_dist, new_omega, s.primal_weight)

    zero = jnp.zeros_like(s.sum_weights)

    def restarted():
        return s.replace(
            x=cand_x, y=cand_y, ax=cand_ax, aty=cand_aty,
            primal_weight=new_omega,
            sum_weights=zero,
            avg_x=jnp.zeros_like(s.avg_x),
            avg_y=jnp.zeros_like(s.avg_y),
            avg_ax=jnp.zeros_like(s.avg_ax),
            avg_aty=jnp.zeros_like(s.avg_aty),
            x_last_restart=cand_x,
            y_last_restart=cand_y,
            last_restart_kkt=candidate_kkt,
            last_candidate_kkt=candidate_kkt,
            iters_since_restart=jnp.zeros_like(s.iters_since_restart),
        )

    def not_restarted():
        return s.replace(last_candidate_kkt=candidate_kkt)

    return jax.lax.cond(do_restart, restarted, not_restarted), do_restart


# ============================================================ major chunk
def make_major_fn(cfg: StaticCfg):
    """Build the jitted major-iteration function: N PDHG steps +
    termination info + restart, one host sync per call.

    Cached on the (hashable) static config so repeated solves — batch LP,
    MIP node relaxations, tests — share one compilation per problem shape
    (the jit cache underneath retraces per shape/operator type)."""
    return _cached_major_fn(cfg)


from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=64)
def _cached_major_fn(cfg: StaticCfg):

    def major(dev: DeviceProblem, s: SolverState):
        from cuopt_tpu.utils.tracing import trace_scope

        with trace_scope("pdlp_pdhg_steps"):
            s = jax.lax.fori_loop(
                0, cfg.hp.major_iteration,
                lambda i, st: _take_step(dev, st, cfg), s,
            )
        # termination info in user space, for current and average iterates
        from cuopt_tpu.utils.tracing import trace_scope as _ts

        with _ts("pdlp_termination"):
            info_cur = _unscaled_info(dev, s.x, s.y, s.ax, s.aty)
        has_avg = s.sum_weights > 0.0
        avg_x = jnp.where(has_avg, s.avg_x, s.x)
        avg_y = jnp.where(has_avg, s.avg_y, s.y)
        avg_ax = jnp.where(has_avg, s.avg_ax, s.ax)
        avg_aty = jnp.where(has_avg, s.avg_aty, s.aty)
        info_avg = _unscaled_info(dev, avg_x, avg_y, avg_ax, avg_aty)

        def optimal(info, rhs_norm, c_norm):
            ok_p = info["l2_primal_res"] <= (
                cfg.abs_primal + cfg.rel_primal * rhs_norm
            )
            ok_d = info["l2_dual_res"] <= (
                cfg.abs_dual + cfg.rel_dual * c_norm
            )
            ok_g = info["gap"] <= cfg.abs_gap + cfg.rel_gap * (
                jnp.abs(info["primal_obj"]) + jnp.abs(info["dual_obj"])
            )
            return jnp.logical_and(ok_p, jnp.logical_and(ok_d, ok_g))

        rhs_norm = jnp.sqrt(jnp.sum(
            jnp.maximum(
                jnp.where(dev.lc_fin, jnp.abs(dev.lc0_orig), 0.0),
                jnp.where(dev.uc_fin, jnp.abs(dev.uc0_orig), 0.0),
            ) ** 2
        ))
        c_norm = jnp.sqrt(jnp.sum(dev.c_orig ** 2))
        opt_cur = optimal(info_cur, rhs_norm, c_norm)
        opt_avg = optimal(info_avg, rhs_norm, c_norm)

        # restart bookkeeping on the scaled problem
        sc_cur = _scaled_info(dev, s.x, s.y, s.ax, s.aty)
        sc_avg = _scaled_info(dev, avg_x, avg_y, avg_ax, avg_aty)
        kkt_cur = _kkt_score(sc_cur, s.primal_weight)
        kkt_avg = jnp.where(
            has_avg, _kkt_score(sc_avg, s.primal_weight), jnp.inf
        )
        if cfg.detect_infeasibility:
            primal_inf, dual_inf = _infeasibility_flags(dev, s, cfg)
        else:
            primal_inf = jnp.asarray(False)
            dual_inf = jnp.asarray(False)

        if cfg.hp.restart_strategy == RESTART_NONE:
            did_restart = jnp.asarray(False)
        elif cfg.hp.restart_strategy == RESTART_TRUST_REGION:
            # normalized localized duality gap replaces the KKT score as
            # the restart potential (reference run_trust_region_restart,
            # pdlp_restart_strategy.cu)
            tr_cur = _localized_gap(
                dev, s.x, s.y, s.ax, s.aty, s.primal_weight,
                s.x_last_restart, s.y_last_restart,
            )
            tr_avg = jnp.where(
                has_avg,
                _localized_gap(
                    dev, avg_x, avg_y, avg_ax, avg_aty, s.primal_weight,
                    s.x_last_restart, s.y_last_restart,
                ),
                jnp.inf,
            )
            s, did_restart = _maybe_restart(dev, s, cfg, tr_cur, tr_avg)
        else:
            s, did_restart = _maybe_restart(dev, s, cfg, kkt_cur, kkt_avg)

        report = dict(
            opt_cur=opt_cur, opt_avg=opt_avg,
            numerical_error=s.numerical_error,
            primal_infeasible=primal_inf,
            dual_infeasible=dual_inf,
            did_restart=did_restart,
            kkt_cur=kkt_cur, kkt_avg=kkt_avg,
            # iterates for solution extraction (user space)
            x_cur=s.x * dev.col_scale, y_cur=s.y * dev.row_scale,
            x_avg=avg_x * dev.col_scale, y_avg=avg_y * dev.row_scale,
            reduced_cost_cur=dev.c_orig - s.aty / dev.col_scale,
            reduced_cost_avg=dev.c_orig - avg_aty / dev.col_scale,
            info_cur=info_cur, info_avg=info_avg,
            total_steps=s.total_steps,
            total_attempts=s.total_attempts,
            step_size=s.step_size,
            primal_weight=s.primal_weight,
        )
        return s, report

    return jax.jit(major)


# ============================================================== scaling
def compute_scaling(op, lc_fin, uc_fin, lc0, uc0, hp: PdlpHyperParams,
                    dtype):
    """Ruiz L-inf equilibration + Pock-Chambolle alpha scaling (reference
    initial_scaling_strategy/initial_scaling.cuh:32, ruiz :85,
    pock_chambolle :86). Returns (scaled_op, row_scale, col_scale)."""
    n, m = op.shape
    row_scale = jnp.ones((n,), dtype)
    col_scale = jnp.ones((m,), dtype)
    cur = op
    if hp.do_ruiz_scaling:
        for _ in range(hp.l_inf_ruiz_iterations):
            rmax = cur.row_abs_max()
            cmax = cur.col_abs_max()
            r = jnp.where(rmax > 0, 1.0 / jnp.sqrt(rmax), 1.0)
            c = jnp.where(cmax > 0, 1.0 / jnp.sqrt(cmax), 1.0)
            cur = cur.rescale(r, c)
            row_scale = row_scale * r
            col_scale = col_scale * c
    if hp.do_pock_chambolle_scaling:
        alpha = hp.alpha_pock_chambolle
        rsum = cur.row_abs_reduce(2.0 - alpha)
        csum = cur.col_abs_reduce(alpha)
        r = jnp.where(rsum > 0, 1.0 / jnp.sqrt(rsum), 1.0)
        c = jnp.where(csum > 0, 1.0 / jnp.sqrt(csum), 1.0)
        cur = cur.rescale(r, c)
        row_scale = row_scale * r
        col_scale = col_scale * c
    return cur, row_scale, col_scale


def build_device_problem(prob, hp: PdlpHyperParams, dtype,
                         operator_kind: str = "auto") -> DeviceProblem:
    """Host CSR problem -> scaled on-device problem.

    Cached per problem OBJECT: slab construction + upload + scaling
    took ~20 s per call at 250k rows (r04 profile), and re-solves
    (warm starts, benchmarks, the concurrent method) were paying it
    every time. The cache key is (dtype, operator_kind, scaling knobs);
    callers who mutate a problem in place must drop `_device_cache`."""
    key = (str(jnp.dtype(dtype)), operator_kind, hp.do_ruiz_scaling,
           hp.l_inf_ruiz_iterations, hp.do_pock_chambolle_scaling,
           hp.alpha_pock_chambolle)
    cache = getattr(prob, "_device_cache", None)
    if cache is not None and cache[0] == key:
        return cache[1]
    dev = _build_device_problem_uncached(prob, hp, dtype, operator_kind)
    try:
        prob._device_cache = (key, dev)
    except Exception:  # noqa: BLE001 — immutable problem containers
        pass
    return dev


def _build_device_problem_uncached(prob, hp, dtype, operator_kind):
    n, m = prob.n_constraints, prob.n_variables
    sign = -1.0 if prob.maximize else 1.0
    c_orig = jnp.asarray(sign * prob.objective_coefficients, dtype)
    lv_orig = jnp.asarray(prob.variable_lower_bounds, dtype)
    uv_orig = jnp.asarray(prob.variable_upper_bounds, dtype)
    lc_orig = jnp.asarray(prob.constraint_lower_bounds, dtype)
    uc_orig = jnp.asarray(prob.constraint_upper_bounds, dtype)
    offset = jnp.asarray(sign * prob.objective_offset, dtype)

    op0 = build_operator(
        prob.offsets, prob.indices, prob.values, n, m, dtype=dtype,
        kind=operator_kind,
    )
    row_perm = inv_row_perm = col_perm = inv_col_perm = None
    from cuopt_tpu.sparse import PermutedOp
    if isinstance(op0, PermutedOp):
        # absorb the bandwidth-reducing permutation into the problem:
        # one-time gathers here; the hot loop then runs un-gathered on
        # the banded inner operator
        row_perm, col_perm = op0.row_perm, op0.col_perm
        inv_row_perm, inv_col_perm = op0.inv_row_perm, op0.inv_col_perm
        op0 = op0.inner
        c_orig = c_orig[col_perm]
        lv_orig = lv_orig[col_perm]
        uv_orig = uv_orig[col_perm]
        lc_orig = lc_orig[row_perm]
        uc_orig = uc_orig[row_perm]
    lv_fin = jnp.isfinite(lv_orig)
    uv_fin = jnp.isfinite(uv_orig)
    lc_fin = jnp.isfinite(lc_orig)
    uc_fin = jnp.isfinite(uc_orig)
    lc0_orig = jnp.where(lc_fin, lc_orig, 0.0)
    uc0_orig = jnp.where(uc_fin, uc_orig, 0.0)
    lv0_orig = jnp.where(lv_fin, lv_orig, 0.0)
    uv0_orig = jnp.where(uv_fin, uv_orig, 0.0)

    op, row_scale, col_scale = compute_scaling(
        op0, lc_fin, uc_fin, lc0_orig, uc0_orig, hp, dtype
    )
    # scaled vectors: c' = C c; l_c' = R l_c; l_v' = l_v / C
    c = c_orig * col_scale
    lc = lc_orig * row_scale
    uc = uc_orig * row_scale
    lv = lv_orig / col_scale
    uv = uv_orig / col_scale
    return DeviceProblem(
        op=op, c=c, lv=lv, uv=uv, lc=lc, uc=uc,
        lv_fin=lv_fin, uv_fin=uv_fin, lc_fin=lc_fin, uc_fin=uc_fin,
        lv0=jnp.where(lv_fin, lv, 0.0), uv0=jnp.where(uv_fin, uv, 0.0),
        lc0=jnp.where(lc_fin, lc, 0.0), uc0=jnp.where(uc_fin, uc, 0.0),
        c_orig=c_orig, lv_orig=lv_orig, uv_orig=uv_orig,
        lc_orig=lc_orig, uc_orig=uc_orig,
        lv0_orig=lv0_orig, uv0_orig=uv0_orig,
        lc0_orig=lc0_orig, uc0_orig=uc0_orig,
        row_scale=row_scale, col_scale=col_scale, offset=offset,
        row_perm=row_perm, inv_row_perm=inv_row_perm,
        col_perm=col_perm, inv_col_perm=inv_col_perm,
    )


def initial_state(dev: DeviceProblem, hp: PdlpHyperParams, dtype,
                  x0=None, y0=None) -> SolverState:
    """Initial iterates, step size and primal weight (reference
    pdlp.cu compute_initial_step_size / compute_initial_primal_weight:
    eta0 = scaling / max|A|; omega0 = importance * ||c||/||b_combined||,
    both on the scaled problem for the default Stable2 config)."""
    n, m = dev.op.shape
    if x0 is None:
        x = jnp.zeros((m,), dtype)
        if hp.project_initial_primal:
            x = jnp.clip(x, dev.lv, dev.uv)
    else:
        x = jnp.asarray(x0, dtype)
        if dev.col_perm is not None:  # user space -> permuted space
            x = x[dev.col_perm]
        x = x / dev.col_scale
    if y0 is None:
        y = jnp.zeros((n,), dtype)
    else:
        y = jnp.asarray(y0, dtype)
        if dev.row_perm is not None:
            y = y[dev.row_perm]
        y = y / dev.row_scale
    ax = dev.op.matvec(x)
    aty = dev.op.rmatvec(y)

    abs_max = dev.op.abs_max()
    eta0 = jnp.where(
        abs_max > 0.0, hp.initial_step_size_scaling / abs_max,
        jnp.asarray(hp.initial_step_size_scaling, dtype),
    )
    combined = jnp.maximum(
        jnp.where(dev.lc_fin, jnp.abs(dev.lc0), 0.0),
        jnp.where(dev.uc_fin, jnp.abs(dev.uc0), 0.0),
    )
    b_norm = jnp.sqrt(
        hp.initial_primal_weight_b_scaling * jnp.sum(combined ** 2)
    )
    c_norm = jnp.sqrt(
        hp.initial_primal_weight_c_scaling * jnp.sum(dev.c ** 2)
    )
    omega0 = jnp.where(
        jnp.logical_and(b_norm > 0.0, c_norm > 0.0),
        hp.primal_importance * c_norm / b_norm,
        jnp.asarray(hp.primal_importance, dtype),
    )
    zero_i = jnp.zeros((), jnp.int64)
    return SolverState(
        x=x, y=y, ax=ax, aty=aty,
        step_size=eta0.astype(dtype),
        primal_weight=omega0.astype(dtype),
        sum_weights=jnp.zeros((), dtype),
        avg_x=jnp.zeros_like(x), avg_y=jnp.zeros_like(y),
        avg_ax=jnp.zeros_like(ax), avg_aty=jnp.zeros_like(aty),
        x_last_restart=x, y_last_restart=y,
        last_restart_kkt=jnp.asarray(jnp.inf, dtype),
        last_candidate_kkt=jnp.asarray(jnp.inf, dtype),
        iters_since_restart=zero_i,
        total_steps=zero_i, total_attempts=zero_i,
        numerical_error=jnp.asarray(False),
    )


def _host_activity(prob, x):
    """A @ x on host (per-constraint residual checks)."""
    act = np.zeros(prob.n_constraints)
    rows = np.repeat(
        np.arange(prob.n_constraints, dtype=np.int64),
        np.diff(prob.offsets),
    )
    np.add.at(act, rows, prob.values * x[prob.indices])
    return act


# ============================================================== host driver
class PdlpSolver:
    """Host driver: builds the device problem, runs jitted major
    iterations, checks time/iteration limits between them (reference
    pdlp.cu run_solver :984)."""

    def __init__(self, prob, settings: PDLPSolverSettings):
        self.prob = prob
        self.settings = settings
        self.hp = PRESETS[settings.pdlp_solver_mode]
        # Large instances amortize the per-major host sync: over the
        # device tunnel a termination readback costs ~1 s regardless of
        # size (r04 profile: 15 majors x 40 steps ran 28 s wall vs 1.2 s
        # of kernel time), so big problems check termination every ~160
        # steps instead of 40. Termination granularity coarsens by at
        # most one major — negligible against the per-sync savings.
        if prob.nnz >= 5_000_000 and self.hp.major_iteration < 160:
            import dataclasses as _dc

            self.hp = _dc.replace(self.hp, major_iteration=160)
        self.dtype = jnp.float64 if settings.dtype == "float64" \
            else jnp.float32
        t = settings.tolerances
        self.cfg = StaticCfg(
            hp=self.hp,
            abs_primal=t.absolute_primal_tolerance,
            rel_primal=t.relative_primal_tolerance,
            abs_dual=t.absolute_dual_tolerance,
            rel_dual=t.relative_dual_tolerance,
            abs_gap=t.absolute_gap_tolerance,
            rel_gap=t.relative_gap_tolerance,
            detect_infeasibility=settings.detect_infeasibility,
            primal_inf_tol=t.primal_infeasible_tolerance,
            dual_inf_tol=t.dual_infeasible_tolerance,
        )
        self.major_fn = make_major_fn(self.cfg)
        self.log = get_logger()

    def run(self, timer: Timer | None = None):
        from cuopt_tpu.utils.tracing import maybe_start_profile

        maybe_start_profile()
        settings = self.settings
        timer = timer or Timer(settings.time_limit)
        dev = build_device_problem(
            self.prob, self.hp, self.dtype, settings.operator_kind
        )
        if settings.warm_start_data is not None:
            from cuopt_tpu.lp.warm_start import restore_state

            state = restore_state(settings.warm_start_data, dev,
                                  self.dtype)
        else:
            state = initial_state(
                dev, self.hp, self.dtype,
                settings.initial_primal_solution,
                settings.initial_dual_solution,
            )
        status = C.CUOPT_TERIMINATION_STATUS_NO_TERMINATION
        report = None
        use_avg = False
        it = 0
        inf_streak = 0
        unb_streak = 0
        best_primal = None  # (obj, x) under save_best_primal_so_far
        # strict: first detection terminates; non-strict: require two
        # consecutive majors agreeing (reference pdlp.cu:718-723)
        needed_streak = 1 if settings.strict_infeasibility else 2
        self.log.info(
            f"PDLP: {self.prob.n_constraints} rows, "
            f"{self.prob.n_variables} cols, {self.prob.nnz} nnz, "
            f"operator={type(dev.op).__name__}, dtype={settings.dtype}"
        )
        rhs_norm = float(np.sqrt(np.nansum(np.square(np.where(
            np.isfinite(self.prob.constraint_lower_bounds)
            | np.isfinite(self.prob.constraint_upper_bounds),
            np.maximum(
                np.abs(np.where(
                    np.isfinite(self.prob.constraint_lower_bounds),
                    self.prob.constraint_lower_bounds, 0.0)),
                np.abs(np.where(
                    np.isfinite(self.prob.constraint_upper_bounds),
                    self.prob.constraint_upper_bounds, 0.0)),
            ), 0.0)))))
        t = settings.tolerances
        _SCALAR_KEYS = ("opt_cur", "opt_avg", "numerical_error",
                        "total_steps", "primal_infeasible",
                        "dual_infeasible")
        _INFO_KEYS = ("primal_obj", "dual_obj", "gap",
                      "l2_primal_res", "l2_dual_res")
        # compile/solve split: time-to-first-major-return includes the
        # device problem build + XLA compile (VERDICT r04 #10: the 275s
        # cold compile was invisible inside headline solve times)
        import time as _time

        t_run0 = _time.perf_counter()
        t_first_major = None
        while True:
            state, report = self.major_fn(dev, state)
            # ONE host transfer for ALL per-major scalars: each separate
            # bool()/float() on a device scalar costs a full sync +
            # tunnel roundtrip (~35 ms at 250k rows; nine such fetches
            # measured a 500 it/s major loop down to 120 it/s — r04),
            # so the scalars are stacked on device and fetched together.
            packed = np.asarray(jnp.stack(
                [jnp.asarray(report[k], jnp.float64)
                 for k in _SCALAR_KEYS]
                + [jnp.asarray(report["info_cur"][k], jnp.float64)
                   for k in _INFO_KEYS]
            ))
            if t_first_major is None:
                t_first_major = _time.perf_counter() - t_run0
            (f_opt_cur, f_opt_avg, f_num, f_steps, f_pinf, f_dinf,
             v_pobj, v_dobj, v_gap, v_rp, v_rd) = packed
            opt_cur = bool(f_opt_cur)
            opt_avg = bool(f_opt_avg)
            numerical = bool(f_num)
            it = int(f_steps)
            info_c = report["info_cur"]
            self.log.debug(
                f"  {it:>8d}  obj {v_pobj:+.8e}  "
                f"dual {v_dobj:+.8e}  gap {v_gap:.2e}  "
                f"|rp| {v_rp:.2e}  |rd| {v_rd:.2e}"
            )
            if settings.per_constraint_residual and (opt_cur or opt_avg):
                # strengthen termination: every constraint's violation must
                # meet abs + rel * |b_i| (reference per_constraint_residual,
                # solver_settings.hpp:186)
                for flag, which in ((opt_cur, "cur"), (opt_avg, "avg")):
                    if not flag:
                        continue
                    xx = np.asarray(report[f"x_{which}"])
                    if dev.inv_col_perm is not None:
                        xx = xx[np.asarray(dev.inv_col_perm)]
                    act = _host_activity(self.prob, xx)
                    lo = self.prob.constraint_lower_bounds
                    hi = self.prob.constraint_upper_bounds
                    vio = np.maximum(
                        np.where(np.isfinite(lo), lo - act, 0.0),
                        np.where(np.isfinite(hi), act - hi, 0.0),
                    )
                    limit = t.absolute_primal_tolerance + \
                        t.relative_primal_tolerance * np.maximum(
                            np.abs(np.where(np.isfinite(lo), lo, 0.0)),
                            np.abs(np.where(np.isfinite(hi), hi, 0.0)),
                        )
                    if np.any(vio > limit):
                        if which == "cur":
                            opt_cur = False
                        else:
                            opt_avg = False
            if settings.save_best_primal_so_far or \
                    settings.first_primal_feasible:
                ok_p = v_rp <= (
                    t.absolute_primal_tolerance
                    + t.relative_primal_tolerance * rhs_norm
                )
                if ok_p:
                    obj_c = float(v_pobj)
                    if best_primal is None or obj_c < best_primal[0]:
                        best_primal = (obj_c, np.asarray(report["x_cur"]))
                    if settings.first_primal_feasible:
                        status = \
                            C.CUOPT_TERIMINATION_STATUS_PRIMAL_FEASIBLE
                        break
            if opt_cur or opt_avg:
                status = C.CUOPT_TERIMINATION_STATUS_OPTIMAL
                use_avg = opt_avg and not opt_cur
                break
            if numerical:
                status = C.CUOPT_TERIMINATION_STATUS_NUMERICAL_ERROR
                break
            if settings.detect_infeasibility:
                inf_streak = inf_streak + 1 if bool(f_pinf) else 0
                unb_streak = unb_streak + 1 if bool(f_dinf) else 0
                if inf_streak >= needed_streak:
                    status = C.CUOPT_TERIMINATION_STATUS_INFEASIBLE
                    break
                if unb_streak >= needed_streak:
                    status = C.CUOPT_TERIMINATION_STATUS_UNBOUNDED
                    break
            if it >= settings.iteration_limit:
                status = C.CUOPT_TERIMINATION_STATUS_ITERATION_LIMIT
                break
            if timer.expired():
                status = C.CUOPT_TERIMINATION_STATUS_TIME_LIMIT
                break
        info = report["info_avg"] if use_avg else report["info_cur"]
        sol = {
            "status": status,
            "iterations": it,
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
            # time to the first major's return = problem build + XLA
            # compile (+1 warm major); the iteration loop is the rest
            "compile_s": round(t_first_major or 0.0, 4),
            "solve_loop_s": round(
                max(timer.elapsed() - (t_first_major or 0.0), 0.0), 4
            ),
        }
        if settings.save_best_primal_so_far and best_primal is not None \
                and best_primal[0] < sol["primal_objective"]:
            sol["primal_solution"] = best_primal[1]
            sol["primal_objective"] = best_primal[0]
        # full internal state for re-solves (reference pdlp.cu:470-488).
        # Captured LAZILY: the snapshot downloads ~10 full vectors over
        # the device tunnel (~0.5 s each at 250k rows — r04 profile) and
        # most solves never use it; Solution.get_pdlp_warm_start_data
        # materializes on first access. The closure holds only the
        # state + the two scale vectors, not the slabs.
        _rs, _cs, _st = dev.row_scale, dev.col_scale, state

        def _lazy_ws(_st=_st, _rs=_rs, _cs=_cs):
            from cuopt_tpu.lp.warm_start import capture_warm_start

            class _D:  # minimal dev view for capture_warm_start
                row_scale, col_scale = _rs, _cs

            return capture_warm_start(_D, _st)

        sol["warm_start_data_fn"] = _lazy_ws
        # solution vectors live in permuted space when the operator was
        # bandwidth-reordered: gather back to user order (warm-start data
        # intentionally stays in permuted space — it is restored against
        # the same deterministic permutation of the same problem)
        if dev.inv_col_perm is not None:
            inv_cp = np.asarray(dev.inv_col_perm)
            inv_rp = np.asarray(dev.inv_row_perm)
            sol["primal_solution"] = sol["primal_solution"][inv_cp]
            sol["dual_solution"] = sol["dual_solution"][inv_rp]
            sol["reduced_cost"] = sol["reduced_cost"][inv_cp]
        # undo the minimize transform for maximize problems
        if self.prob.maximize:
            sol["primal_objective"] = -sol["primal_objective"]
            sol["dual_objective"] = -sol["dual_objective"]
            sol["dual_solution"] = -sol["dual_solution"]
            sol["reduced_cost"] = -sol["reduced_cost"]
        return sol
