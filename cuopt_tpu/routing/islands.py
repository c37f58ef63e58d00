"""Mesh-sharded routing population islands (BASELINE distribution
axis 3).

TPU re-design of the reference population/island metaheuristic driver
(cpp/src/routing/diversity/diverse_solver.hpp:151: population islands
with injection, evolved by GPU local-search kernels): here each DEVICE
of a `jax.sharding.Mesh` owns one island of P solutions; a jitted
`shard_map` epoch

  1. vmaps a full local-search sweep (evaluate_moves + device-side
     move application) over the island's members,
  2. ring-migrates each island's champion to the next device via
     `jax.lax.ppermute` (the reference's island ring migration),
  3. all-reduces the incumbent cost with `jax.lax.pmin` so every
     island prunes against the global best.

Solutions are the solver's fixed-shape (F, L) route matrices (serve
order ids, -1 padded) + per-route lengths, so the same tensors flow
between the host GES/diversity loop and the sharded islands.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from cuopt_tpu.routing.local_search import (
    BIG,
    LsProblem,
    evaluate_moves,
)


# --------------------------------------------------------------- apply
def _remove_at(row, length, i):
    """Remove list index i from a -1-padded row."""
    L = row.shape[0]
    pos = jnp.arange(L)
    src = jnp.minimum(pos + (pos >= i).astype(pos.dtype), L - 1)
    out = row[src]
    return jnp.where(pos >= length - 1, -1, out)


def _insert_at(row, length, j, val):
    """Insert val at slot j (before current index j)."""
    L = row.shape[0]
    pos = jnp.arange(L)
    src = jnp.maximum(pos - 1, 0)
    shifted = row[src]
    out = jnp.where(pos < j, row, jnp.where(pos == j, val, shifted))
    return jnp.where(pos > length, -1, out)


def _remove2_at(row, length, i):
    L = row.shape[0]
    pos = jnp.arange(L)
    src = jnp.minimum(pos + 2 * (pos >= i).astype(pos.dtype), L - 1)
    out = row[src]
    return jnp.where(pos >= length - 2, -1, out)


def _insert2_at(row, length, j, a, b):
    L = row.shape[0]
    pos = jnp.arange(L)
    src = jnp.maximum(pos - 2, 0)
    shifted = row[src]
    out = jnp.where(
        pos < j, row,
        jnp.where(pos == j, a, jnp.where(pos == j + 1, b, shifted)),
    )
    return jnp.where(pos > length + 1, -1, out)


def _set_rows(R, lens, f1, row1, len1, f2, row2, len2):
    rows = jnp.arange(R.shape[0])[:, None]
    R = jnp.where(rows == f1, row1.astype(R.dtype)[None], R)
    R = jnp.where(rows == f2, row2.astype(R.dtype)[None], R)
    idx = jnp.arange(R.shape[0])
    lens = jnp.where(idx == f1, jnp.asarray(len1, lens.dtype), lens)
    lens = jnp.where(idx == f2, jnp.asarray(len2, lens.dtype), lens)
    return R, lens


def apply_move(p: LsProblem, R, lens, kind, mv):
    """Apply one move from `evaluate_moves`' unified encoding, fully
    on-device (the host-side twin lives in routing/solver.py; this one
    lets whole LS sweeps run inside one jitted program per island)."""
    a, b, c, d = mv[0], mv[1], mv[2], mv[3]

    def reloc(args):
        R, lens = args
        f2, j, f1, i = a, b, c, d
        u = R[f1, i]
        row1 = _remove_at(R[f1], lens[f1], i)
        row2 = _insert_at(R[f2], lens[f2], j, u)
        return _set_rows(R, lens, f1, row1, lens[f1] - 1,
                         f2, row2, lens[f2] + 1)

    def swap(args):
        R, lens = args
        f1, i, f2, k = a, b, c, d
        u, w = R[f1, i], R[f2, k]
        R = R.at[f1, i].set(w).at[f2, k].set(u)
        return R, lens

    def twoopt(args):
        R, lens = args
        f, i, k = a, b, d
        pos = jnp.arange(R.shape[1])
        src = jnp.where((pos >= i) & (pos <= k), k - (pos - i), pos)
        row = R[f][src]
        rows = jnp.arange(R.shape[0])[:, None]
        return jnp.where(rows == f, row[None], R), lens

    def twostar(args):
        R, lens = args
        f1, i, f2, k = a, b, c, d  # cut = kept-order counts
        L = R.shape[1]
        pos = jnp.arange(L)
        n1 = i + (lens[f2] - k)
        n2 = k + (lens[f1] - i)
        src1 = jnp.clip(pos - i + k, 0, L - 1)
        row1 = jnp.where(pos < i, R[f1], R[f2][src1])
        row1 = jnp.where(pos < n1, row1, -1)
        src2 = jnp.clip(pos - k + i, 0, L - 1)
        row2 = jnp.where(pos < k, R[f2], R[f1][src2])
        row2 = jnp.where(pos < n2, row2, -1)
        return _set_rows(R, lens, f1, row1, n1, f2, row2, n2)

    def oropt(args):
        R, lens = args
        f2, j, f1, i = a, b, c, d
        u = R[f1, i]
        w = R[f1, jnp.minimum(i + 1, R.shape[1] - 1)]
        row1 = _remove2_at(R[f1], lens[f1], i)
        row2 = _insert2_at(R[f2], lens[f2], j, u, w)
        return _set_rows(R, lens, f1, row1, lens[f1] - 2,
                         f2, row2, lens[f2] + 2)

    return jax.lax.switch(
        kind, [reloc, swap, twoopt, twostar, oropt], (R, lens)
    )


def solution_cost_device(p: LsProblem, R, lens):
    """Total cost (arc + fixed), matching the host route_cost model:
    empty routes cost nothing; skip_first/drop_return drop the terminal
    legs (routing/internal.py:74)."""
    F, L = R.shape
    valid = R >= 0
    Rc = jnp.where(valid, R, 0)
    locs_mid = jnp.where(valid, p.order_loc[Rc], p.veh_return[:, None])
    locs = jnp.concatenate(
        [p.veh_start[:, None], locs_mid, p.veh_return[:, None]], axis=1
    )
    fvec = jnp.arange(F)
    c_arc = p.cost_mats[
        p.veh_ti[:, None], locs[:, :-1], locs[:, 1:]
    ]  # (F, L+1) — type-indexed, no (F, n, n) copy
    pos = jnp.arange(L + 1)
    keep = pos[None] <= lens[:, None]
    # terminal legs: first (pos 0) priced unless skip_first; the leg at
    # pos == lens returns to the depot, priced unless drop_return
    keep &= ~((pos[None] == 0) & p.skip_first[:, None])
    keep &= ~((pos[None] == lens[:, None]) & p.drop_return[:, None])
    c_arc = jnp.where(keep & (lens > 0)[:, None], c_arc, 0.0)
    fixed = jnp.where(lens > 0, p.veh_fixed, 0.0)
    return jnp.sum(c_arc) + jnp.sum(fixed)


# --------------------------------------------------------------- sweep
def ls_sweep(p: LsProblem, R, lens, n_steps: int):
    """Greedy best-move descent, entirely on device: n_steps rounds of
    evaluate_moves + apply_move (stops improving when no move helps)."""

    def body(i, carry):
        R, lens, done = carry
        best, kind, mv = evaluate_moves(p, R, lens)
        improved = (best < -1e-6) & ~done
        R2, lens2 = apply_move(p, R, lens, kind, mv)
        R = jnp.where(improved, R2, R)
        lens = jnp.where(improved, lens2, lens)
        return R, lens, done | ~improved

    R, lens, _ = jax.lax.fori_loop(
        0, n_steps, body, (R, lens, jnp.zeros((), bool))
    )
    return R, lens


@partial(jax.jit, static_argnames=("n_steps", "axis"))
def _island_epoch_inner(p, Rs, lenss, n_steps, axis):
    """Per-device body: vmapped LS sweep over the island's members,
    champion ppermute to the next island, global pmin incumbent."""
    Rs, lenss = jax.vmap(
        lambda R, ln: ls_sweep(p, R, ln, n_steps)
    )(Rs, lenss)
    costs = jax.vmap(lambda R, ln: solution_cost_device(p, R, ln))(
        Rs, lenss
    )
    kbest = jnp.argmin(costs)
    champ_R, champ_len = Rs[kbest], lenss[kbest]
    champ_cost = costs[kbest]
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    mig_R = jax.lax.ppermute(champ_R, axis, perm)
    mig_len = jax.lax.ppermute(champ_len, axis, perm)
    mig_cost = jax.lax.ppermute(champ_cost, axis, perm)
    # neighbor's champion replaces this island's worst member (unless
    # strictly worse than it)
    kworst = jnp.argmax(costs)
    take = mig_cost < costs[kworst]
    Rs = Rs.at[kworst].set(jnp.where(take, mig_R, Rs[kworst]))
    lenss = lenss.at[kworst].set(
        jnp.where(take, mig_len, lenss[kworst])
    )
    costs = costs.at[kworst].set(
        jnp.where(take, mig_cost, costs[kworst])
    )
    best_cost = jax.lax.pmin(champ_cost, axis)
    return Rs, lenss, costs, best_cost


def island_epoch(p: LsProblem, Rs, lenss, mesh, n_steps=8,
                 axis=None):
    """One sharded evolution epoch.

    Rs: (D*P, F, L) member route matrices, lenss: (D*P, F); the leading
    axis is sharded over the mesh (D islands x P members each). Returns
    (Rs, lenss, member costs, global best cost).
    """
    from jax.sharding import PartitionSpec as P

    if axis is None:
        axis = mesh.axis_names[0]
    pspec = jax.tree_util.tree_map(lambda _: P(), p)
    fn = jax.shard_map(
        partial(_island_epoch_inner, n_steps=n_steps, axis=axis),
        mesh=mesh,
        in_specs=(pspec, P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
        # the replicated LsProblem mixes with per-island tensors inside
        # lax.scan carries; skip the varying-manual-axes bookkeeping
        check_vma=False,
    )
    return fn(p, Rs, lenss)


def make_island_members(R0, lens0, n_members, rng=None):
    """Tile one solution into an island population with light
    perturbation diversity (rotating each route list)."""
    rng = rng or np.random.default_rng(0)
    R0 = np.asarray(R0)
    lens0 = np.asarray(lens0)
    Rs, lenss = [R0], [lens0]
    for _ in range(n_members - 1):
        R = R0.copy()
        # swap two random movable orders between two random routes
        nz = np.where(lens0 > 0)[0]
        if len(nz) >= 2:
            f1, f2 = rng.choice(nz, 2, replace=False)
            i = int(rng.integers(lens0[f1]))
            k = int(rng.integers(lens0[f2]))
            R[f1, i], R[f2, k] = R[f2, k], R[f1, i]
        Rs.append(R)
        lenss.append(lens0.copy())
    return np.stack(Rs), np.stack(lenss)
