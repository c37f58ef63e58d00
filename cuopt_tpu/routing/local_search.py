"""Massively-parallel local search move evaluation (jitted JAX).

TPU re-design of the reference move-candidate machinery
(cpp/src/routing/local_search/local_search.cuh:102-160: CROSS/2-opt/
relocate kernels over move_candidates/): ALL candidate moves are scored
as dense tensors in one jitted call —

  - relocate: every (order position) x (insertion slot) pair,
  - swap (CROSS): every inter-route position pair,
  - 2-opt: every intra-route segment reversal (symmetric matrices,
    no time windows),
  - 2-opt* (tail exchange, the reference's CROSS-exchange over route
    tails): every (cut position in r1) x (cut position in r2) pair for
    compatible vehicles,
  - Or-opt: every length-2 consecutive segment x (insertion slot) pair
    (the reference's sliding-window segment moves),

with O(1) feasibility per candidate from forward departure times and
backward latest-arrival slacks (the reference's forward/backward
dimension cumulations, route/route.cuh). The host applies the best move
and re-invokes; evaluation cost is one fused device program.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

BIG = 1e12


@struct.dataclass
class LsProblem:
    order_loc: jax.Array  # (n_serve,)
    e: jax.Array  # tw early
    l: jax.Array  # tw late
    s: jax.Array  # service
    demand: jax.Array  # (ndim, n_serve)
    capacity: jax.Array  # (ndim, F)
    veh_ti: jax.Array  # (F,) type index
    veh_start: jax.Array
    veh_return: jax.Array
    veh_tw_early: jax.Array
    veh_tw_late: jax.Array
    veh_fixed: jax.Array
    cost_mats: jax.Array  # (T, L, L)
    time_mats: jax.Array
    movable: jax.Array  # (n_serve,) bool: not PD-paired
    allowed: jax.Array  # (n_serve, F) bool
    skip_first: jax.Array  # (F,) bool
    drop_return: jax.Array  # (F,) bool
    # per-vehicle max route (arc) cost, BIG where unconstrained: scored
    # as a move-tensor dimension so the device top-k is not mostly
    # discarded by the host recheck on constrained instances (reference
    # carries these as route dimensions, route/route.cuh:29)
    veh_max_cost: jax.Array  # (F,)
    # per-order prize (0 where none); prize orders are optional, so LS
    # scores drop moves (prize < removal saving) in-tensor (reference
    # prize-collection move families, local_search.cuh:102-160)
    prize: jax.Array  # (n_serve,)
    has_tw: bool = struct.field(pytree_node=False)
    allow_2opt: bool = struct.field(pytree_node=False)
    has_max_cost: bool = struct.field(pytree_node=False, default=False)
    has_prize: bool = struct.field(pytree_node=False, default=False)


def build_ls_problem(prob, dtype=jnp.float32) -> LsProblem:
    sym = np.allclose(prob.cost_mats, np.swapaxes(prob.cost_mats, 1, 2))
    has_tw = bool(
        np.any(np.isfinite(prob.tw_late))
        or np.any(prob.service > 0)
        or np.any(np.isfinite(prob.veh_tw_late))
    )
    movable = np.ones(prob.n_serve, bool)
    if prob.pd_partner is not None:
        movable &= prob.pd_partner < 0
    allowed = prob.allowed_vehicles if prob.allowed_vehicles is not None \
        else np.ones((prob.n_serve, prob.n_fleet), bool)
    ti = np.array(
        [prob.type_index[int(t)] for t in prob.veh_type], np.int32
    )
    clip = lambda a: np.where(np.isfinite(a), a, BIG)
    # Max route DURATION folds into the vehicle return deadline: the
    # evaluator's forward pass departs at veh_tw_early, so
    # "return by start + max_time" is exact within the device model
    # (the host recheck stays authoritative for delayed starts).
    tw_late_eff = np.minimum(
        clip(prob.veh_tw_late),
        np.where(np.isfinite(prob.veh_max_time),
                 prob.veh_tw_early + prob.veh_max_time, BIG),
    )
    has_tw = has_tw or bool(np.any(np.isfinite(prob.veh_max_time)))
    has_max_cost = bool(np.any(np.isfinite(prob.veh_max_cost)))
    return LsProblem(
        order_loc=jnp.asarray(prob.order_loc, jnp.int32),
        e=jnp.asarray(prob.tw_early, dtype),
        l=jnp.asarray(clip(prob.tw_late), dtype),
        s=jnp.asarray(prob.service, dtype),
        demand=jnp.asarray(prob.demand, dtype),
        capacity=jnp.asarray(clip(prob.capacity), dtype),
        veh_ti=jnp.asarray(ti),
        veh_start=jnp.asarray(prob.veh_start, jnp.int32),
        veh_return=jnp.asarray(prob.veh_return, jnp.int32),
        veh_tw_early=jnp.asarray(prob.veh_tw_early, dtype),
        veh_tw_late=jnp.asarray(tw_late_eff, dtype),
        veh_fixed=jnp.asarray(prob.veh_fixed_cost, dtype),
        cost_mats=jnp.asarray(prob.cost_mats, dtype),
        time_mats=jnp.asarray(prob.time_mats, dtype),
        movable=jnp.asarray(movable),
        allowed=jnp.asarray(allowed),
        skip_first=jnp.asarray(prob.skip_first, bool),
        drop_return=jnp.asarray(prob.drop_return, bool),
        veh_max_cost=jnp.asarray(clip(prob.veh_max_cost), dtype),
        prize=jnp.asarray(
            prob.prizes if prob.prizes is not None
            else np.zeros(prob.n_serve), dtype,
        ),
        has_tw=has_tw,
        allow_2opt=bool(sym) and not has_tw,
        has_max_cost=has_max_cost,
        has_prize=prob.prizes is not None,
    )


def _route_tensors(p: LsProblem, R, lens):
    """Augmented per-route tensors: locations, departures, slacks, loads.

    R: (F, L) serve-order ids, -1 padded. Positions 1..len hold orders;
    position 0 is the vehicle start, position len+1 the return.
    """
    F, L = R.shape
    dtype = p.e.dtype
    valid = R >= 0  # (F, L)
    Rc = jnp.where(valid, R, 0)
    locs_mid = jnp.where(valid, p.order_loc[Rc], p.veh_return[:, None])
    locs = jnp.concatenate(
        [p.veh_start[:, None], locs_mid, p.veh_return[:, None]], axis=1
    )  # (F, L+2)
    e_aug = jnp.concatenate(
        [p.veh_tw_early[:, None],
         jnp.where(valid, p.e[Rc], 0.0),
         jnp.zeros((F, 1), dtype)], axis=1,
    )
    l_aug = jnp.concatenate(
        [jnp.full((F, 1), BIG, dtype),
         jnp.where(valid, p.l[Rc], BIG),
         p.veh_tw_late[:, None]], axis=1,
    )
    s_aug = jnp.concatenate(
        [jnp.zeros((F, 1), dtype),
         jnp.where(valid, p.s[Rc], 0.0),
         jnp.zeros((F, 1), dtype)], axis=1,
    )
    ti = p.veh_ti  # (F,)
    # NOTE: cost/time matrices stay (T, n_loc, n_loc) and every lookup
    # indexes by TYPE (ti[f]) — materializing per-vehicle copies
    # (p.cost_mats[ti] -> (F, n, n)) was a 27 GB broadcast at 4,000
    # orders (VERDICT r04 #6: no memory plan past 1,000)
    # arc times between consecutive augmented positions
    t_arc = p.time_mats[ti[:, None], locs[:, :-1], locs[:, 1:]]
    # forward pass: arrival/departure via scan over positions
    def fwd(dep_prev, inputs):
        t_in, e_in, s_in = inputs
        arr = jnp.maximum(dep_prev + t_in, e_in)
        dep = arr + s_in
        return dep, (arr, dep)

    dep0 = p.veh_tw_early
    _, (arr_seq, dep_seq) = jax.lax.scan(
        fwd, dep0,
        (t_arc.T, e_aug[:, 1:].T, s_aug[:, 1:].T),
    )
    arr = jnp.concatenate(
        [p.veh_tw_early[:, None], arr_seq.T], axis=1
    )  # (F, L+2) arrival at each augmented position
    dep = jnp.concatenate([dep0[:, None], dep_seq.T], axis=1)

    # backward pass: latest feasible arrival
    def bwd(lat_next, inputs):
        t_in, l_in, s_in = inputs
        lat = jnp.minimum(l_in, lat_next - t_in - s_in)
        return lat, lat

    lat_last = l_aug[:, -1]
    _, lat_seq = jax.lax.scan(
        bwd, lat_last,
        (t_arc.T[::-1], l_aug[:, :-1].T[::-1], s_aug[:, :-1].T[::-1]),
    )
    lat = jnp.concatenate([lat_seq[::-1].T, lat_last[:, None]], axis=1)

    load = jnp.sum(
        jnp.where(valid[None], p.demand[:, Rc], 0.0), axis=2
    )  # (ndim, F)
    return locs, arr, dep, lat, load, ti, valid


def _onehot_cols(loc_flat, n_loc, dtype):
    """Flat location-index vector, carried as-is off-TPU (cheap element
    gathers there) or one-hot encoded (U, n_loc) on TPU — the operand
    that turns a per-element matrix gather into one MXU matmul (see
    _pair_costs)."""
    if jax.default_backend() != "tpu":
        return loc_flat  # CPU/GPU: element gathers are cheap
    return (loc_flat[:, None] ==
            jnp.arange(n_loc)[None, :]).astype(dtype)


def _pair_costs(mats, ti, row_loc, onehot_u, transpose=False):
    """mats[ti[f], a, b] looked up at (row_loc[f, j], u) for every u.

    `mats` is the (T, n_loc, n_loc) per-TYPE matrix — lookups index by
    vehicle type so no (F, n_loc, n_loc) copy ever materializes (27 GB
    at 4,000 orders).

    On TPU: a contiguous ROW gather builds tab[f, j, :] =
    mats[ti[f], row_loc[f, j], :] (or the column-indexed variant when
    `transpose`), then one f32-HIGHEST matmul with the one-hot selects
    the u column — TPU element gathers cost ~30 ns each (~2 s per LS
    round at 1,000 orders, r04 measurement) while the equivalent
    one-hot matmul rides the MXU in ~1 ms. Off-TPU `onehot_u` is the
    raw index vector and a direct element gather is both exact and
    faster (the CPU routing-scale bench regressed 11.6 -> 18.1 s
    construction under the matmul form)."""
    if onehot_u.ndim == 1:  # raw indices: direct element gather
        if transpose:
            return mats[ti[:, None, None], onehot_u[None, None, :],
                        row_loc[:, :, None]]
        return mats[ti[:, None, None], row_loc[:, :, None],
                    onehot_u[None, None, :]]
    if transpose:
        # tab[f, j, loc] = mats[ti[f], loc, row_loc[f, j]]
        mats = jnp.swapaxes(mats, 1, 2)
    tab = mats[ti[:, None], row_loc]  # (F, L1, n_loc)
    return jnp.einsum(
        "fjn,un->fju", tab, onehot_u,
        precision=jax.lax.Precision.HIGHEST,
    )


def _move_scores(p: LsProblem, R, lens):
    """Score all candidate moves; returns the five dense score tensors
    (relocate, swap, 2-opt, 2-opt*, or-opt2), masked-invalid = BIG."""
    F, L = R.shape
    locs, arr, dep, lat, load, ti, valid = _route_tensors(
        p, R, lens
    )
    cmat, tmat = p.cost_mats, p.time_mats  # (T, n, n), type-indexed
    Rc = jnp.where(valid, R, 0)
    fvec = jnp.arange(F)

    # per-route current arc cost, for max-route-cost move dimensions
    if p.has_max_cost:
        pos_arc = jnp.arange(L + 1)
        c_arc = cmat[ti[:, None], locs[:, :-1], locs[:, 1:]]
        c_arc = jnp.where(pos_arc[None] <= lens[:, None], c_arc, 0.0)
        c_arc = jnp.where((lens > 0)[:, None], c_arc, 0.0)  # (F, L+1)
        ccost = jnp.sum(c_arc, axis=1)                      # (F,)
        pre_c = jnp.concatenate(
            [jnp.zeros((F, 1), c_arc.dtype),
             jnp.cumsum(c_arc, axis=1)[:, :L]], axis=1,
        )                                                   # (F, L+1)
        tail_int = ccost[:, None] - pre_c - c_arc           # (F, L+1)

    # ---- relocate: u at (r1, i) -> insert at slot (r2, j) ----
    # removal gain for each position i (1-based augmented index i+1)
    ar = fvec[:, None]
    pos = jnp.arange(L)
    prev_loc = locs[ar, pos]          # predecessor of order at i
    u_loc = locs[ar, pos + 1]
    next_loc = locs[ar, pos + 2]
    c_r1 = cmat[ti[ar], prev_loc, u_loc] + cmat[ti[ar], u_loc, next_loc] - \
        cmat[ti[ar], prev_loc, next_loc]  # (F, L) removal saving
    u_ids = Rc  # (F, L)
    u_dem = p.demand[:, u_ids]  # (ndim, F, L)
    u_movable = valid & p.movable[u_ids]

    # insertion cost of order u into slot (r2, j): between aug j and j+1
    slot = jnp.arange(L + 1)
    q_loc = locs[:, :L + 1]       # (F, L+1) slot predecessor location
    qn_loc = locs[:, 1:L + 2]     # slot successor location
    # cost tensors: (F2, L+1, F1, L) -> use broadcasting:
    # ins_cost[r2, j, u] = c2(q_j, loc_u) + c2(loc_u, q_{j+1}) - c2(q_j,q_{j+1})
    u_loc_flat = p.order_loc[Rc]  # (F, L)
    n_loc = cmat.shape[1]
    onehot_u = _onehot_cols(u_loc_flat.reshape(-1), n_loc, cmat.dtype)
    cA = _pair_costs(cmat, ti, q_loc, onehot_u).reshape(F, L + 1, F, L)
    cB = _pair_costs(cmat, ti, qn_loc, onehot_u,
                     transpose=True).reshape(F, L + 1, F, L)
    cC = cmat[ti[:, None], q_loc, qn_loc][:, :, None, None]
    ins_cost = cA + cB - cC  # (F2, L+1, F1, L)

    reloc_delta = ins_cost - c_r1[None, None, :, :]

    # feasibility
    slot_valid = (slot[None, :] <= lens[:, None])  # (F2, L+1)
    cap_ok = jnp.all(
        (load[:, :, None, None, None] + u_dem[:, None, None, :, :])
        <= p.capacity[:, :, None, None, None] + 1e-6, axis=0,
    )  # (F2, 1?, F1, L) -> shapes: load (ndim,F2) -> (ndim,F2,1,1,1); broadcast
    cap_ok = cap_ok[:, 0]  # (F2, F1, L)
    allowed_ok = p.allowed[Rc][:, :, :]  # (F1, L, F2)
    allowed_ok = jnp.transpose(allowed_ok, (2, 0, 1))  # (F2, F1, L)
    if p.has_tw:
        tA = _pair_costs(tmat, ti, q_loc, onehot_u).reshape(F, L + 1, F, L)
        tB = _pair_costs(tmat, ti, qn_loc, onehot_u,
                         transpose=True).reshape(F, L + 1, F, L)
        dep_slot = dep[:, :L + 1]  # (F2, L+1) departure at slot pred
        arr_u = jnp.maximum(
            dep_slot[:, :, None, None] + tA,
            p.e[Rc][None, None, :, :],
        )
        ok_u = arr_u <= p.l[Rc][None, None, :, :] + 1e-6
        lat_next = lat[:, 1:L + 2]  # (F2, L+1) latest arrival at slot succ
        ok_next = (
            arr_u + p.s[Rc][None, None, :, :] + tB
            <= lat_next[:, :, None, None] + 1e-6
        )
        tw_ok = ok_u & ok_next
    else:
        tw_ok = jnp.ones_like(reloc_delta, bool)

    same_route = (fvec[:, None, None, None] ==
                  fvec[None, None, :, None])
    reloc_mask = (
        slot_valid[:, :, None, None]
        & u_movable[None, None, :, :]
        & cap_ok[:, None, :, :]
        & allowed_ok[:, None, :, :]
        & tw_ok
        & ~same_route
        # receiving route must still fit in the padded width L
        & (lens[:, None, None, None] + 1 <= L)
    )
    if p.has_max_cost:
        # receiving route's new arc cost within its cap (donor only
        # loses cost); axes (F2, L+1, F1, L)
        reloc_mask &= (
            ccost[:, None, None, None] + ins_cost
            <= p.veh_max_cost[:, None, None, None] + 1e-6
        )
    # fixed-cost effects: opening r2, closing r1
    open2 = jnp.where(lens == 0, p.veh_fixed, 0.0)
    close1 = jnp.where(lens == 1, p.veh_fixed, 0.0)
    reloc_delta = reloc_delta + open2[:, None, None, None] - \
        close1[None, None, :, None]
    reloc_score = jnp.where(reloc_mask, reloc_delta, BIG)

    # ---- swap: u at (r1,i) <-> w at (r2,k), r1 < r2 ----
    # replacing u by w at (r1, i): delta1 = c1(prev,w)+c1(w,next)-c1(prev,u)-c1(u,next)
    w_loc = u_loc_flat  # alias for clarity
    d_in = (
        _pair_costs(cmat, ti, prev_loc, onehot_u).reshape(F, L, F, L)
        + _pair_costs(cmat, ti, next_loc, onehot_u,
                      transpose=True).reshape(F, L, F, L)
        - (cmat[ti[ar], prev_loc, u_loc]
           + cmat[ti[ar], u_loc, next_loc])[:, :, None, None]
    )  # (F1, L_i, F2, L_k): cost change in r1 when w replaces u
    swap_delta = d_in + jnp.transpose(d_in, (2, 3, 0, 1))

    dem_u = p.demand[:, Rc]  # (ndim, F, L)
    cap_ok_sw = jnp.all(
        (load[:, :, None, None, None] - dem_u[:, :, :, None, None]
         + dem_u[:, None, None, :, :])
        <= p.capacity[:, :, None, None, None] + 1e-6, axis=0,
    )  # (F1, L_i, F2, L_k) load1 - u + w
    cap_ok_sw2 = jnp.transpose(cap_ok_sw, (2, 3, 0, 1))
    # allowed: w (at r2,k) must be allowed on r1, u (at r1,i) on r2.
    # T1[t, f, l] = order at (f, l) allowed on vehicle t
    T1 = jnp.transpose(p.allowed[Rc], (2, 0, 1))
    allowed_full = (
        T1[:, None, :, :]                            # (F1, 1, F2, Lk)
        & jnp.transpose(T1, (1, 2, 0))[:, :, :, None]  # (F1, Li, F2, 1)
    )

    if p.has_tw:
        tw_in = (
            jnp.maximum(
                dep[:, :L][:, :, None, None]
                + _pair_costs(tmat, ti, prev_loc,
                              onehot_u).reshape(F, L, F, L),
                p.e[Rc][None, None],
            )
        )  # arrival of w at (r1,i)
        ok_w = tw_in <= p.l[Rc][None, None] + 1e-6
        ok_wn = (
            tw_in + p.s[Rc][None, None]
            + _pair_costs(tmat, ti, next_loc, onehot_u,
                          transpose=True).reshape(F, L, F, L)
            <= lat[:, 2:L + 2][:, :, None, None] + 1e-6
        )
        tw_ok1 = ok_w & ok_wn  # (F1, L_i, F2, L_k)
        tw_ok_sw = tw_ok1 & jnp.transpose(tw_ok1, (2, 3, 0, 1))
    else:
        tw_ok_sw = jnp.ones_like(swap_delta, bool)

    vmask = valid  # (F, L)
    movable2 = vmask & p.movable[Rc]
    diff_route = fvec[:, None, None, None] != fvec[None, None, :, None]
    # note axes: (F1, L_i, F2, L_k); build route-inequality correctly
    r1_idx = fvec[:, None, None, None]
    r2_idx = fvec[None, None, :, None]
    swap_mask = (
        movable2[:, :, None, None]
        & movable2[None, None, :, :]
        & (r1_idx != r2_idx)
        & cap_ok_sw
        & cap_ok_sw2
        & allowed_full
        & tw_ok_sw
    )
    if p.has_max_cost:
        ok1 = (ccost[:, None, None, None] + d_in
               <= p.veh_max_cost[:, None, None, None] + 1e-6)
        swap_mask &= ok1 & jnp.transpose(ok1, (2, 3, 0, 1))
    swap_score = jnp.where(swap_mask, swap_delta, BIG)

    # ---- 2-opt intra-route (symmetric, no TW): reverse segment [i..k] ----
    if p.allow_2opt:
        i_idx = jnp.arange(L)[None, :, None]
        k_idx = jnp.arange(L)[None, None, :]
        pi_prev = locs[fvec[:, None, None], i_idx]      # loc before i
        pi = locs[fvec[:, None, None], i_idx + 1]
        pk = locs[fvec[:, None, None], k_idx + 1]
        pk_next = locs[fvec[:, None, None], k_idx + 2]
        two_delta = (
            cmat[ti[:, None, None], pi_prev, pk]
            + cmat[ti[:, None, None], pi, pk_next]
            - cmat[ti[:, None, None], pi_prev, pi]
            - cmat[ti[:, None, None], pk, pk_next]
        )
        two_mask = (
            (i_idx < k_idx)
            & (k_idx < lens[:, None, None])
            & valid[:, :, None] & valid[:, None, :]
        )
        two_score = jnp.where(two_mask, two_delta, BIG)
    else:
        two_score = jnp.full((F, 1, 1), BIG, reloc_score.dtype)

    # ---- 2-opt* (inter-route tail exchange; reference CROSS-exchange,
    # local_search/vrp tail kernels): cut r1 after i kept orders and r2
    # after k kept orders, swap tails. Restricted to "compatible"
    # vehicle pairs (same type matrix, same return location, same
    # shift-end) so the tail's internal arc costs/times are unchanged.
    cut = jnp.arange(L + 1)                       # kept-order count
    u_cut = locs[:, :L + 1]                       # (F, L+1) last kept loc
    v_succ = locs[:, 1:L + 2]                     # (F, L+1) first tail loc
    dep_cut = dep[:, :L + 1]                      # departure at cut point
    lat_succ = lat[:, 1:L + 2]                    # latest arrival at succ
    # suffix demand per cut: sum of demands of orders at list idx >= i
    dem_pos = jnp.where(valid[None], p.demand[:, Rc], 0.0)  # (ndim,F,L)
    suf_dem = jnp.concatenate(
        [jnp.cumsum(dem_pos[:, :, ::-1], axis=2)[:, :, ::-1],
         jnp.zeros((dem_pos.shape[0], F, 1), dem_pos.dtype)], axis=2,
    )  # (ndim, F, L+1)
    pre_dem = load[:, :, None] - suf_dem          # (ndim, F, L+1)
    # suffix movable / suffix-allowed-on-vehicle
    mov_pos = jnp.where(valid, p.movable[Rc], True)  # (F, L)
    suf_mov = jnp.concatenate(
        [(jnp.cumsum((~mov_pos[:, ::-1]).astype(jnp.int32), axis=1)
          [:, ::-1] == 0),
         jnp.ones((F, 1), bool)], axis=1,
    )  # (F, L+1): all orders at idx >= i movable
    alw_pos = jnp.where(valid[:, :, None], p.allowed[Rc], True)  # (F,L,F2)
    suf_alw = jnp.concatenate(
        [(jnp.cumsum((~alw_pos[:, ::-1]).astype(jnp.int32), axis=1)
          [:, ::-1] == 0),
         jnp.ones((F, 1, F), bool)], axis=1,
    )  # (F, L+1, F2): all tail orders of F allowed on vehicle F2

    f1 = fvec[:, None, None, None]
    f2 = fvec[None, None, :, None]
    i_c = cut[None, :, None, None]
    k_c = cut[None, None, None, :]
    # new route sizes after the exchange
    n1_new = i_c + (lens[None, None, :, None] - k_c)
    n2_new = k_c + (lens[:, None, None, None] - i_c)
    # Two new cross arcs c_{f1}(u1_i, v2_{k+1}) + c_{f2}(u2_k, v1_{i+1})
    # minus the two old ones — except that an EMPTY route traverses no
    # start->return arc in the exact host model (route_cost charges 0), so
    # the fictitious arc of a route that is empty before (lens==0) or
    # after (n_new==0) the exchange is zeroed rather than priced.
    onehot_vs = _onehot_cols(v_succ.reshape(-1), n_loc, cmat.dtype)
    cross_a = _pair_costs(cmat, ti, u_cut, onehot_vs).reshape(
        F, L + 1, F, L + 1
    )  # [f, i, f', k] = c_f(u_cut[f,i], v_succ[f',k])
    new1 = jnp.where(n1_new == 0, 0.0, cross_a)
    new2 = jnp.where(
        n2_new == 0, 0.0,
        jnp.transpose(cross_a, (2, 3, 0, 1)),
    )
    old1 = jnp.where(
        lens[:, None, None, None] == 0, 0.0,
        cmat[ti[f1], u_cut[:, :, None, None], v_succ[:, :, None, None]],
    )
    old2 = jnp.where(
        lens[None, None, :, None] == 0, 0.0,
        cmat[ti[f2], u_cut[None, None], v_succ[None, None]],
    )
    ts_delta = new1 + new2 - old1 - old2  # (F1, L+1, F2, L+1)
    # fixed-cost change from routes opening/closing
    was1 = lens[:, None, None, None] > 0
    was2 = lens[None, None, :, None] > 0
    ts_delta = (
        ts_delta
        + p.veh_fixed[:, None, None, None]
        * ((n1_new > 0).astype(ts_delta.dtype) - was1.astype(ts_delta.dtype))
        + p.veh_fixed[None, None, :, None]
        * ((n2_new > 0).astype(ts_delta.dtype) - was2.astype(ts_delta.dtype))
    )
    compat = (
        (p.veh_ti[:, None] == p.veh_ti[None, :])
        & (p.veh_return[:, None] == p.veh_return[None, :])
        & (p.veh_tw_late[:, None] == p.veh_tw_late[None, :])
        # skip_first/drop_return change which terminal arcs are priced:
        # the cancellation of tail-internal terms is only valid when both
        # vehicles price their terminal arcs identically
        & (p.skip_first[:, None] == p.skip_first[None, :])
        & (p.drop_return[:, None] == p.drop_return[None, :])
    )  # (F1, F2)
    cap1_ok = jnp.all(
        pre_dem[:, :, :, None, None] + suf_dem[:, None, None, :, :]
        <= p.capacity[:, :, None, None, None] + 1e-6, axis=0,
    )  # (F1, L+1, F2, L+1)
    cap2_ok = jnp.transpose(cap1_ok, (2, 3, 0, 1))
    if p.has_tw:
        t_cross_a = _pair_costs(tmat, ti, u_cut, onehot_vs).reshape(
            F, L + 1, F, L + 1
        )
        t_cross1 = t_cross_a
        t_cross2 = jnp.transpose(t_cross_a, (2, 3, 0, 1))
        tw1_ok = (dep_cut[:, :, None, None] + t_cross1
                  <= lat_succ[None, None] + 1e-6)
        tw2_ok = (dep_cut[None, None] + t_cross2
                  <= lat_succ[:, :, None, None] + 1e-6)
        ts_tw_ok = tw1_ok & tw2_ok
    else:
        ts_tw_ok = jnp.ones_like(ts_delta, bool)
    cut1_valid = cut[None, :] <= lens[:, None]    # (F, L+1)
    # allowed: tail of r2 (idx >= k) on vehicle r1, and tail of r1 on r2
    alw_tail2_on1 = suf_alw[
        fvec[None, None, :, None], k_c, fvec[:, None, None, None]
    ]  # (F1, 1->L+1 bcast? shapes: all (F1, L+1, F2, L+1))
    alw_tail1_on2 = suf_alw[
        fvec[:, None, None, None], i_c, fvec[None, None, :, None]
    ]
    ts_mask = (
        compat[:, None, :, None]
        & (f1 != f2)
        & cut1_valid[:, :, None, None]
        & cut1_valid[None, None]
        & suf_mov[:, :, None, None]
        & suf_mov[None, None]
        & alw_tail2_on1
        & alw_tail1_on2
        & cap1_ok & cap2_ok & ts_tw_ok
        # both resulting routes must fit in the padded width L
        & (n1_new <= L) & (n2_new <= L)
    )
    if p.has_max_cost:
        # new arc cost of each route: kept prefix + new cross arc +
        # internal cost of the received tail (tail arcs are identical
        # across compat vehicles)
        cost1_new = (pre_c[:, :, None, None] + new1
                     + tail_int[None, None, :, :])
        cost2_new = (pre_c[None, None, :, :] + new2
                     + tail_int[:, :, None, None])
        ts_mask &= (
            (cost1_new <= p.veh_max_cost[:, None, None, None] + 1e-6)
            & (cost2_new <= p.veh_max_cost[None, None, :, None] + 1e-6)
        )
    ts_score = jnp.where(ts_mask, ts_delta, BIG)

    # ---- Or-opt: move the 2-segment (i, i+1) of r1 into slot (r2, j) ----
    seg_ok = valid & jnp.concatenate(
        [valid[:, 1:], jnp.zeros((F, 1), bool)], axis=1
    )  # positions i with a valid successor i+1
    uA = locs[ar, pos + 1]                        # (F, L) first seg loc
    uB_idx = jnp.minimum(pos + 2, L + 1)
    uN_idx = jnp.minimum(pos + 3, L + 1)
    uB = locs[ar, uB_idx]                          # second seg loc
    uNext = locs[ar, uN_idx]                       # successor of segment
    rem_save = (
        cmat[ti[ar], prev_loc, uA] + cmat[ti[ar], uA, uB] + cmat[ti[ar], uB, uNext]
        - cmat[ti[ar], prev_loc, uNext]
    )  # (F1, L)
    idsA, idsB = Rc, jnp.roll(Rc, -1, axis=1)
    locA = p.order_loc[idsA]
    locB = p.order_loc[jnp.where(seg_ok, idsB, idsA)]
    # locA == u_loc_flat, so oA reuses the relocate cA tensor; oI's
    # per-pair (locA_u, locB_u) lookup stays a (small) element gather
    onehot_locB = _onehot_cols(locB.reshape(-1), n_loc, cmat.dtype)
    oA = cA
    # oI[f2, j, f1, i] = c_{f2}(locA[f1,i], locB[f1,i]): a per-(f2, u)
    # element gather (F x F x L, ~300k entries) broadcast over j
    oI = cmat[ti[:, None, None], locA[None], locB[None]][:, None]
    oB = _pair_costs(cmat, ti, qn_loc, onehot_locB,
                     transpose=True).reshape(F, L + 1, F, L)
    oro_delta = oA + oI + oB - cC - rem_save[None, None]
    seg_dem = p.demand[:, idsA] + jnp.where(
        seg_ok[None], p.demand[:, jnp.where(seg_ok, idsB, idsA)], 0.0
    )  # (ndim, F1, L)
    oro_cap_ok = jnp.all(
        (load[:, :, None, None, None] + seg_dem[:, None, None, :, :])
        <= p.capacity[:, :, None, None, None] + 1e-6, axis=0,
    )[:, 0]  # (F2, F1, L)
    seg_movable = (
        seg_ok & p.movable[idsA]
        & p.movable[jnp.where(seg_ok, idsB, idsA)]
    )
    alw_seg = (
        p.allowed[idsA] & p.allowed[jnp.where(seg_ok, idsB, idsA)]
    )  # (F1, L, F2)
    alw_seg_t = jnp.transpose(alw_seg, (2, 0, 1))  # (F2, F1, L)
    if p.has_tw:
        tA_ = tA  # identical index structure (locA == u_loc_flat)
        tI_ = tmat[ti[:, None, None], locA[None], locB[None]][:, None]
        tB_ = _pair_costs(tmat, ti, qn_loc, onehot_locB,
                          transpose=True).reshape(F, L + 1, F, L)
        eA = p.e[idsA][None, None]
        lA = p.l[idsA][None, None]
        sA = p.s[idsA][None, None]
        idsB_safe = jnp.where(seg_ok, idsB, idsA)
        eB = p.e[idsB_safe][None, None]
        lB = p.l[idsB_safe][None, None]
        sB = p.s[idsB_safe][None, None]
        arr_A = jnp.maximum(dep_slot[:, :, None, None] + tA_, eA)
        ok_A = arr_A <= lA + 1e-6
        arr_B = jnp.maximum(arr_A + sA + tI_, eB)
        ok_B = arr_B <= lB + 1e-6
        ok_N = arr_B + sB + tB_ <= lat_next[:, :, None, None] + 1e-6
        oro_tw_ok = ok_A & ok_B & ok_N
    else:
        oro_tw_ok = jnp.ones_like(oro_delta, bool)
    oro_mask = (
        slot_valid[:, :, None, None]
        & seg_movable[None, None]
        & oro_cap_ok[:, None]
        & alw_seg_t[:, None]
        & oro_tw_ok
        & ~same_route
        # receiving route gains 2 orders; must fit in padded width L
        & (lens[:, None, None, None] + 2 <= L)
    )
    if p.has_max_cost:
        oro_mask &= (
            ccost[:, None, None, None] + (oA + oI + oB - cC)
            <= p.veh_max_cost[:, None, None, None] + 1e-6
        )
    close1_seg = jnp.where(lens == 2, p.veh_fixed, 0.0)
    oro_delta = oro_delta + open2[:, None, None, None] - \
        close1_seg[None, None, :, None]
    oro_score = jnp.where(oro_mask, oro_delta, BIG)
    return reloc_score, swap_score, two_score, ts_score, oro_score


@partial(jax.jit, static_argnames=())
def evaluate_moves(p: LsProblem, R, lens):
    """Score all moves; return (delta, kind, (a, b, c, d))."""
    reloc_score, swap_score, two_score, ts_score, oro_score = \
        _move_scores(p, R, lens)

    # ---- pick global best ----
    r_best = jnp.min(reloc_score)
    s_best = jnp.min(swap_score)
    t_best = jnp.min(two_score)
    ts_best = jnp.min(ts_score)
    o_best = jnp.min(oro_score)
    best = jnp.minimum(
        jnp.minimum(jnp.minimum(r_best, s_best), t_best),
        jnp.minimum(ts_best, o_best),
    )

    r_arg = jnp.unravel_index(jnp.argmin(reloc_score), reloc_score.shape)
    s_arg = jnp.unravel_index(jnp.argmin(swap_score), swap_score.shape)
    t_arg = jnp.unravel_index(jnp.argmin(two_score), two_score.shape)
    ts_arg = jnp.unravel_index(jnp.argmin(ts_score), ts_score.shape)
    o_arg = jnp.unravel_index(jnp.argmin(oro_score), oro_score.shape)

    kind = jnp.where(
        best == r_best, 0,
        jnp.where(
            best == s_best, 1,
            jnp.where(best == t_best, 2,
                      jnp.where(best == ts_best, 3, 4)),
        ),
    )
    # unified move encoding:
    #  relocate: (r2, slot j, r1, i)
    #  swap:     (r1, i, r2, k)
    #  2opt:     (r, i, r, k)
    #  2opt*:    (r1, cut i, r2, cut k)
    #  or-opt2:  (r2, slot j, r1, i)
    mv = jnp.where(
        kind == 0,
        jnp.stack([r_arg[0], r_arg[1], r_arg[2], r_arg[3]]),
        jnp.where(
            kind == 1,
            jnp.stack([s_arg[0], s_arg[1], s_arg[2], s_arg[3]]),
            jnp.where(
                kind == 2,
                jnp.stack([t_arg[0], t_arg[1], t_arg[0], t_arg[2]]),
                jnp.where(
                    kind == 3,
                    jnp.stack([ts_arg[0], ts_arg[1], ts_arg[2],
                               ts_arg[3]]),
                    jnp.stack([o_arg[0], o_arg[1], o_arg[2], o_arg[3]]),
                ),
            ),
        ),
    )
    return best, kind, mv


@jax.jit
def evaluate_insertions(p: LsProblem, R, lens, cand_ids):
    """Score inserting each candidate order into every slot of every
    route: returns (P, F, L+1) delta-cost tensor, BIG where infeasible.

    This is the device-batched insertion scoring used by large-instance
    construction and the GES insertion step (reference scores insertions
    with GPU kernels inside guided_ejection_search.cuh:81; here one fused
    program covers all (candidate, route, slot) triples with O(1) TW
    feasibility from the forward/backward route cumulations)."""
    F, L = R.shape
    locs, arr, dep, lat, load, ti, valid = _route_tensors(
        p, R, lens
    )
    cmat, tmat = p.cost_mats, p.time_mats  # (T, n, n), type-indexed
    cand = jnp.asarray(cand_ids, jnp.int32)  # (P,)
    u_loc = p.order_loc[cand]                # (P,)
    slot = jnp.arange(L + 1)
    q_loc = locs[:, :L + 1]                  # (F, L+1)
    qn_loc = locs[:, 1:L + 2]
    fvec = jnp.arange(F)
    n_loc = cmat.shape[1]
    onehot_p = _onehot_cols(u_loc, n_loc, cmat.dtype)  # (P, n_loc)
    cA = jnp.transpose(
        _pair_costs(cmat, ti, q_loc, onehot_p), (2, 0, 1)
    )  # (P, F, L+1)
    cB = jnp.transpose(
        _pair_costs(cmat, ti, qn_loc, onehot_p, transpose=True), (2, 0, 1)
    )
    cC = cmat[ti[:, None], q_loc, qn_loc][None]
    delta = cA + cB - cC                     # (P, F, L+1)
    # opening an empty route pays its fixed cost
    delta = delta + jnp.where(lens == 0, p.veh_fixed, 0.0)[None, :, None]

    slot_ok = slot[None, :] <= lens[:, None]           # (F, L+1)
    cap_ok = jnp.all(
        load[:, None, :] + p.demand[:, cand][:, :, None]
        <= p.capacity[:, None, :] + 1e-6, axis=0,
    )  # (P, F)
    fit_ok = (lens + 1 <= L)[None, :]                  # (1, F)
    allowed_ok = p.allowed[cand]                       # (P, F)
    if p.has_tw:
        tA = jnp.transpose(
            _pair_costs(tmat, ti, q_loc, onehot_p), (2, 0, 1)
        )
        tB = jnp.transpose(
            _pair_costs(tmat, ti, qn_loc, onehot_p, transpose=True),
            (2, 0, 1),
        )
        dep_slot = dep[:, :L + 1]
        arr_u = jnp.maximum(dep_slot[None] + tA, p.e[cand][:, None, None])
        ok_u = arr_u <= p.l[cand][:, None, None] + 1e-6
        lat_next = lat[:, 1:L + 2]
        ok_n = arr_u + p.s[cand][:, None, None] + tB <= \
            lat_next[None] + 1e-6
        tw_ok = ok_u & ok_n
    else:
        tw_ok = jnp.ones_like(delta, bool)
    mask = (
        slot_ok[None]
        & (cap_ok & allowed_ok & fit_ok)[:, :, None]
        & tw_ok
    )
    if p.has_max_cost:
        pos_arc = jnp.arange(L + 1)
        c_arc = cmat[ti[:, None], locs[:, :-1], locs[:, 1:]]
        c_arc = jnp.where(pos_arc[None] <= lens[:, None], c_arc, 0.0)
        c_arc = jnp.where((lens > 0)[:, None], c_arc, 0.0)
        ccost = jnp.sum(c_arc, axis=1)
        mask &= (
            ccost[None, :, None] + (cA + cB - cC)
            <= p.veh_max_cost[None, :, None] + 1e-6
        )
    return jnp.where(mask, delta, BIG)


@jax.jit
def evaluate_insertions_best(p: LsProblem, R, lens, cand_ids,
                             cand_mask):
    """Per-candidate best insertion, reduced ON DEVICE: returns
    (best_delta (P,), best_route (P,), best_slot (P,)).

    Construction calls this once per round with cand_ids PADDED to a
    fixed bucket (cand_mask False on padding): fixed shapes mean ONE
    compile for the whole construction (the r03 path recompiled every
    round as `pending` shrank — minutes each over the remote-compile
    tunnel) and the host transfer drops from the full (P, F, L+1) score
    tensor (MBs per round over the tunnel) to three P-vectors."""
    scores = evaluate_insertions.__wrapped__(p, R, lens, cand_ids)
    P, F, L1 = scores.shape
    flat = scores.reshape(P, F * L1)
    idx = jnp.argmin(flat, axis=1)
    best = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    best = jnp.where(jnp.asarray(cand_mask), best, BIG)
    # ONE packed array -> one host transfer (see evaluate_moves_topk)
    return jnp.stack(
        [best.astype(jnp.float32),
         (idx // L1).astype(jnp.float32),
         (idx % L1).astype(jnp.float32)], axis=1,
    )


@partial(jax.jit, static_argnames=("kf",))
def evaluate_moves_topk(p: LsProblem, R, lens, kf: int = 8):
    """Top-kf moves per family in one device program.

    The reference executes whole move SETS per GPU iteration
    (local_search/move_candidates/): candidates are generated in bulk and
    a maximal non-conflicting subset is applied. Here the device returns
    the kf best candidates of each family; the host greedily applies all
    that touch disjoint routes, so one device round-trip commits many
    moves instead of one.

    Returns (deltas (5*kf,), kinds (5*kf,), mvs (5*kf, 4)); padded /
    invalid entries have delta >= BIG.
    """
    scores = _move_scores(p, R, lens)

    def family_topk(score, kind_id, unpack):
        flat = jnp.concatenate(
            [score.reshape(-1), jnp.full((kf,), BIG, score.dtype)]
        )
        neg, idx = jax.lax.top_k(-flat, kf)
        idx = jnp.minimum(idx, score.size - 1 if score.size else 0)
        args = jnp.unravel_index(idx, score.shape)
        mv = unpack(args)  # (kf, 4)
        return -neg, jnp.full((kf,), kind_id, jnp.int32), mv

    def std4(args):
        return jnp.stack(args, axis=1).astype(jnp.int32)

    def two4(args):
        return jnp.stack(
            [args[0], args[1], args[0], args[2]], axis=1
        ).astype(jnp.int32)

    outs = [
        family_topk(scores[0], 0, std4),
        family_topk(scores[1], 1, std4),
        family_topk(scores[2], 2, two4),
        family_topk(scores[3], 3, std4),
        family_topk(scores[4], 4, std4),
    ]
    deltas = jnp.concatenate([o[0] for o in outs])
    kinds = jnp.concatenate([o[1] for o in outs])
    mvs = jnp.concatenate([o[2] for o in outs])
    # pack into ONE array so the host fetches the whole candidate set
    # in a single transfer (three separate np.asarray calls each cost a
    # device-tunnel sync — ~0.3-1 s apiece on the axon backend)
    packed = jnp.concatenate(
        [deltas[:, None].astype(jnp.float32),
         kinds[:, None].astype(jnp.float32),
         mvs.astype(jnp.float32)], axis=1,
    )
    return packed


@jax.jit
def evaluate_cycle_gains(p: LsProblem, R, lens):
    """Best single-order relocation gain between every ordered route pair.

    Returns (gain (F, F), pos (F, F), slot (F, F)): gain[r1, r2] = best
    delta of moving ONE order of r1 into r2, with r2's capacity relaxed
    by its smallest movable demand (in an exchange CYCLE every route also
    loses an order; the host re-checks the assembled cycle exactly).
    This is the TPU-first analogue of the reference cycle finder's
    per-pair relocation gains (local_search/cycle_finder/cycle_finder.cu:
    device hash maps of best moves); the negative-cycle search over the
    (F, F) matrix runs on host (F is small).
    """
    F, L = R.shape
    locs, arr, dep, lat, load, ti, valid = _route_tensors(
        p, R, lens
    )
    cmat, tmat = p.cost_mats, p.time_mats  # (T, n, n), type-indexed
    Rc = jnp.where(valid, R, 0)
    fvec = jnp.arange(F)
    ar = fvec[:, None]
    pos = jnp.arange(L)
    prev_loc = locs[ar, pos]
    u_loc = locs[ar, pos + 1]
    next_loc = locs[ar, pos + 2]
    c_rem = cmat[ti[ar], prev_loc, u_loc] + cmat[ti[ar], u_loc, next_loc] - \
        cmat[ti[ar], prev_loc, next_loc]          # (F1, L) removal saving
    u_loc_flat = p.order_loc[Rc]
    q_loc = locs[:, :L + 1]
    qn_loc = locs[:, 1:L + 2]
    cA = cmat[ti[:, None, None, None], q_loc[:, :, None, None],
              u_loc_flat[None, None]]
    cB = cmat[ti[:, None, None, None], u_loc_flat[None, None],
              qn_loc[:, :, None, None]]
    cC = cmat[ti[:, None], q_loc, qn_loc][:, :, None, None]
    ins = cA + cB - cC                        # (F2, L+1, F1, L)
    delta = ins - c_rem[None, None]

    u_movable = valid & p.movable[Rc]
    u_dem = p.demand[:, Rc]                   # (ndim, F1, L)
    # r2's smallest movable demand (it loses one order in the cycle)
    dem_mov = jnp.where(u_movable[None], u_dem, jnp.inf)
    min_out = jnp.min(dem_mov, axis=2)        # (ndim, F2)
    min_out = jnp.where(jnp.isfinite(min_out), min_out, 0.0)
    cap_ok = jnp.all(
        load[:, :, None, None, None] - min_out[:, :, None, None, None]
        + u_dem[:, None, None]
        <= p.capacity[:, :, None, None, None] + 1e-6, axis=0,
    )[:, 0]                                   # (F2, F1, L)
    allowed_ok = jnp.transpose(p.allowed[Rc], (2, 0, 1))
    slot_ok = (jnp.arange(L + 1)[None, :] <= lens[:, None])
    if p.has_tw:
        tA = tmat[ti[:, None, None, None], q_loc[:, :, None, None],
                  u_loc_flat[None, None]]
        tB = tmat[ti[:, None, None, None], u_loc_flat[None, None],
                  qn_loc[:, :, None, None]]
        dep_slot = dep[:, :L + 1]
        arr_u = jnp.maximum(
            dep_slot[:, :, None, None] + tA, p.e[Rc][None, None]
        )
        ok_u = arr_u <= p.l[Rc][None, None] + 1e-6
        ok_n = arr_u + p.s[Rc][None, None] + tB <= \
            lat[:, 1:L + 2][:, :, None, None] + 1e-6
        tw_ok = ok_u & ok_n
    else:
        tw_ok = jnp.ones_like(delta, bool)
    same = fvec[:, None, None, None] == fvec[None, None, :, None]
    mask = (
        slot_ok[:, :, None, None]
        & u_movable[None, None]
        & cap_ok[:, None]
        & allowed_ok[:, None]
        & tw_ok
        & ~same
        & (lens[:, None, None, None] + 1 <= L)
    )
    score = jnp.where(mask, delta, BIG)       # (F2, L+1, F1, L)
    # reduce to per-(r1 -> r2) best move
    sc = jnp.transpose(score, (2, 0, 1, 3))   # (F1, F2, L+1, L)
    flat = sc.reshape(F, F, -1)
    best = jnp.min(flat, axis=2)              # (F1, F2)
    argb = jnp.argmin(flat, axis=2)
    slot_idx = argb // L
    pos_idx = argb % L
    return best, pos_idx.astype(jnp.int32), slot_idx.astype(jnp.int32)


@jax.jit
def evaluate_vehicle_reassign(p: LsProblem, R, lens):
    """Cost + feasibility of serving route r's order SEQUENCE with every
    vehicle v (reference HVRP regret kernels, local_search/hvrp/): one
    (F_veh, F_route, L) forward time scan under each vehicle's matrices.

    Returns (cost (F2, F1), feasible (F2, F1)); infeasible = BIG cost.
    The host-side regret selection reassigns routes to cheaper vehicles.
    """
    F, L = R.shape
    dtype = p.e.dtype
    valid = R >= 0
    Rc = jnp.where(valid, R, 0)
    # order locations per route position; terminal locs PER VEHICLE v2
    locs_mid = p.order_loc[Rc]                     # (F1, L)
    ti = p.veh_ti
    tmat = p.time_mats                             # (T, n, n) by type
    cmat = p.cost_mats
    v2 = ti[jnp.arange(F)][:, None, None]          # type per vehicle
    start2 = p.veh_start[:, None, None]            # (F2, 1, 1)
    ret2 = p.veh_return[:, None, None]
    # augmented location sequence under vehicle v2: (F2, F1, L+2)
    locs = jnp.concatenate([
        jnp.broadcast_to(start2, (F, F, 1)),
        jnp.broadcast_to(
            jnp.where(valid, locs_mid, p.veh_return[0])[None], (F, F, L)
        ),
        jnp.broadcast_to(ret2, (F, F, 1)),
    ], axis=2)
    # pad positions use the vehicle's return loc so padded arcs cost 0
    pos_valid = jnp.concatenate([
        jnp.ones((F, F, 1), bool),
        jnp.broadcast_to(valid[None], (F, F, L)),
        jnp.ones((F, F, 1), bool),
    ], axis=2)
    locs = jnp.where(pos_valid, locs, ret2)
    t_arc = tmat[v2, locs[:, :, :-1], locs[:, :, 1:]]  # (F2, F1, L+1)
    c_arc = cmat[v2, locs[:, :, :-1], locs[:, :, 1:]]
    # collapse padded arcs: loc==ret for both ends -> arc cost 0 anyway
    e_aug = jnp.concatenate([
        jnp.broadcast_to(jnp.where(valid, p.e[Rc], 0.0)[None], (F, F, L)),
        jnp.zeros((F, F, 1), dtype),
    ], axis=2)
    l_aug = jnp.concatenate([
        jnp.broadcast_to(jnp.where(valid, p.l[Rc], BIG)[None], (F, F, L)),
        jnp.broadcast_to(p.veh_tw_late[:, None, None], (F, F, 1)),
    ], axis=2)
    s_aug = jnp.concatenate([
        jnp.broadcast_to(jnp.where(valid, p.s[Rc], 0.0)[None], (F, F, L)),
        jnp.zeros((F, F, 1), dtype),
    ], axis=2)

    def fwd(carry, inp):
        dep_prev, ok = carry
        t_in, e_in, l_in, s_in = inp
        arr = jnp.maximum(dep_prev + t_in, e_in)
        ok = ok & (arr <= l_in + 1e-6)
        return (arr + s_in, ok), None

    dep0 = jnp.broadcast_to(p.veh_tw_early[:, None], (F, F))
    (dep_end, ok), _ = jax.lax.scan(
        fwd, (dep0, jnp.ones((F, F), bool)),
        (jnp.moveaxis(t_arc, 2, 0), jnp.moveaxis(e_aug, 2, 0),
         jnp.moveaxis(l_aug, 2, 0), jnp.moveaxis(s_aug, 2, 0)),
    )
    cost = jnp.sum(c_arc, axis=2)
    # capacity + order-vehicle match + fixed cost
    load = jnp.sum(jnp.where(valid[None], p.demand[:, Rc], 0.0), axis=2)
    cap_ok = jnp.all(load[:, None, :] <= p.capacity[:, :, None] + 1e-6,
                     axis=0)                      # (F2, F1)
    alw = jnp.where(valid[:, :, None], p.allowed[Rc], True)
    alw_ok = jnp.transpose(jnp.all(alw, axis=1), (1, 0))  # (F2, F1)
    nonempty = (lens > 0)[None, :]
    cost = cost + jnp.where(nonempty, p.veh_fixed[:, None], 0.0)
    feasible = ok & cap_ok & alw_ok & nonempty
    return jnp.where(feasible, cost, BIG), feasible


def subset_ls_problem(p: LsProblem, idx) -> LsProblem:
    """Route-subset view: gather every per-vehicle field at `idx` so the
    all-pairs evaluators run on a GROUP of routes (the large-instance
    tiling — all-pairs tensors are O((F*L)^2) and stop fitting around
    2-4k orders; the reference tiles move generation over neighborhoods
    instead, local_search.cuh:102). Order-space fields are unchanged, so
    move encodings index into the subset and map back through `idx`."""
    idx = jnp.asarray(idx, jnp.int32)
    return p.replace(
        capacity=p.capacity[:, idx],
        veh_ti=p.veh_ti[idx],
        veh_start=p.veh_start[idx],
        veh_return=p.veh_return[idx],
        veh_tw_early=p.veh_tw_early[idx],
        veh_tw_late=p.veh_tw_late[idx],
        veh_fixed=p.veh_fixed[idx],
        veh_max_cost=p.veh_max_cost[idx],
        skip_first=p.skip_first[idx],
        drop_return=p.drop_return[idx],
        allowed=p.allowed[:, idx],
    )


@jax.jit
def evaluate_prize_drops(p: LsProblem, R, lens):
    """(F, L) net objective change of dropping each served order:
    prize[u] - (removal arc saving + any fixed-cost close). Negative =
    improving for the prize objective (cost - collected prizes); BIG
    where invalid. The reference scores order drop/pickup inside its LS
    candidate tensors (local_search.cuh:102-160 prize collection)."""
    F, L = R.shape
    locs, arr, dep, lat, load, ti, valid = _route_tensors(p, R, lens)
    cmat = p.cost_mats
    Rc = jnp.where(valid, R, 0)
    fvec = jnp.arange(F)
    ar = fvec[:, None]
    pos = jnp.arange(L)
    prev_loc = locs[ar, pos]
    u_loc = locs[ar, pos + 1]
    next_loc = locs[ar, pos + 2]
    saving = (
        cmat[ti[ar], prev_loc, u_loc]
        + cmat[ti[ar], u_loc, next_loc]
        - cmat[ti[ar], prev_loc, next_loc]
    )
    close = jnp.where(lens == 1, p.veh_fixed, 0.0)
    delta = p.prize[Rc] - saving - close[:, None]
    mask = valid & p.movable[Rc]
    return jnp.where(mask, delta, BIG)
