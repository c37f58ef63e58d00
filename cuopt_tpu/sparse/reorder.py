"""Bandwidth-reducing row/column permutations for sparse matrices.

The reference's cusparse CSR SpMV (cpp/src/linear_programming/
cusparse_view.hpp:30) is pattern-oblivious: GPUs gather well. TPUs do
not — the fast SpMV here is the BlockBandOp MXU slab operator
(cuopt_tpu/sparse/ops.py), which needs the nonzeros of each 128-row tile
to live in a narrow column window. Many "unstructured" LP matrices
(multicommodity, set-cover, scheduling models) are bandable after a
simultaneous row+column permutation.

This module computes that permutation on host with the classic
barycentric (Sloan/King-flavoured) sweep for bipartite graphs:
alternately order rows by the mean position of their column neighbours
and columns by the mean position of their row neighbours. Each sweep is
O(nnz) in vectorized numpy; a handful of sweeps converges. The sweep is
seeded both from the natural order and from a degree-sorted order, and
the best result under the band-area cost is kept.

The permutation is applied around the operator by PermutedOp
(sparse/ops.py): solve the permuted problem, gather the solution back.
"""

from __future__ import annotations

import numpy as np


def _csr_rows(offsets: np.ndarray) -> np.ndarray:
    return np.repeat(
        np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
    )


def tile_window_widths(
    offsets: np.ndarray,
    indices: np.ndarray,
    col_pos: np.ndarray,
    n_rows: int,
    tile: int,
) -> np.ndarray:
    """Per-128-row-tile full column-window width (hi - lo + 1) under the
    column positions `col_pos`, for rows in their current order."""
    T = (n_rows + tile - 1) // tile
    widths = np.zeros(T, np.int64)
    pos = col_pos[indices]
    for t in range(T):
        a = offsets[min(t * tile, n_rows)]
        b = offsets[min((t + 1) * tile, n_rows)]
        if b > a:
            seg = pos[a:b]
            widths[t] = int(seg.max()) - int(seg.min()) + 1
    return widths


def _gather_rows(offsets, row_perm):
    """Vectorized source positions of every nnz of A[row_perm] (CSR order).
    Returns (new_offsets, src_idx) with indices'/values' = old[src_idx]."""
    counts = np.diff(offsets)
    perm_counts = counts[row_perm]
    new_offsets = np.concatenate([[0], np.cumsum(perm_counts)])
    total = int(new_offsets[-1])
    src_start = offsets[row_perm]
    src_idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(new_offsets[:-1], perm_counts)
        + np.repeat(src_start, perm_counts)
    )
    return new_offsets, src_idx


def band_cost(offsets, indices, row_perm, col_perm, n_rows, n_cols,
              tile=128, quantile=0.85) -> float:
    """Cost of a candidate ordering: the q-quantile of per-tile window
    widths (the slab width the band operator would need, up to spill)."""
    inv_col = np.empty(n_cols, np.int64)
    inv_col[col_perm] = np.arange(n_cols)
    perm_offsets, src_idx = _gather_rows(offsets, row_perm)
    idx_list = indices[src_idx]
    widths = tile_window_widths(
        perm_offsets, idx_list, inv_col.astype(np.float64), n_rows, tile
    )
    nz = widths[widths > 0]
    if len(nz) == 0:
        return 0.0
    return float(np.quantile(nz, quantile))


def _first_occurrence_order(keys, ranks):
    """Unique keys ordered by the minimum rank at which each appears
    (ties broken by key)."""
    order = np.lexsort((ranks, keys))  # sort by key, then rank
    k_sorted = keys[order]
    r_sorted = ranks[order]
    first = np.ones(len(k_sorted), bool)
    first[1:] = k_sorted[1:] != k_sorted[:-1]
    uniq = k_sorted[first]
    min_rank = r_sorted[first]
    return uniq[np.argsort(min_rank, kind="stable")]


def cuthill_mckee_permutation(
    offsets: np.ndarray,
    indices: np.ndarray,
    n_rows: int,
    n_cols: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Bipartite Cuthill–McKee: level-synchronous BFS over the bipartite
    row/column graph, ordering each side by (BFS level, first parent's
    position). Recovers hidden band/staircase structure exactly when the
    matrix is a row/col permutation of a banded one — the standard
    bandwidth-minimization result CM is known for, applied to the
    rectangular (bipartite) case."""
    offsets = np.asarray(offsets, np.int64)
    indices = np.asarray(indices, np.int64)
    rows_of = _csr_rows(offsets)
    # transpose adjacency (cols -> rows)
    t_offsets = np.zeros(n_cols + 1, np.int64)
    np.add.at(t_offsets, indices + 1, 1)
    np.cumsum(t_offsets, out=t_offsets)
    order_by_col = np.argsort(indices, kind="stable")
    t_indices = rows_of[order_by_col]

    row_deg = np.diff(offsets)
    row_order = np.empty(n_rows, np.int64)
    col_order = np.empty(n_cols, np.int64)
    row_seen = np.zeros(n_rows, bool)
    col_seen = np.zeros(n_cols, bool)
    r_ctr = c_ctr = 0

    deg_rank = np.argsort(row_deg, kind="stable")  # component seeds
    seed_ptr = 0
    while r_ctr < n_rows:
        while seed_ptr < n_rows and row_seen[deg_rank[seed_ptr]]:
            seed_ptr += 1
        if seed_ptr >= n_rows:
            break
        frontier = np.array([deg_rank[seed_ptr]], np.int64)
        row_seen[frontier] = True
        row_order[r_ctr:r_ctr + 1] = frontier
        r_ctr += 1
        side = "r"
        while len(frontier):
            if side == "r":
                # expand rows -> cols
                counts = row_deg[frontier]
                starts = offsets[frontier]
                total = int(counts.sum())
                if total == 0:
                    break
                flat = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(counts) - counts, counts)
                    + np.repeat(starts, counts)
                )
                nbr = indices[flat]
                ranks = np.repeat(np.arange(len(frontier)), counts)
                new = _first_occurrence_order(nbr, ranks)
                new = new[~col_seen[new]]
                col_seen[new] = True
                col_order[c_ctr:c_ctr + len(new)] = new
                c_ctr += len(new)
                frontier, side = new, "c"
            else:
                # expand cols -> rows
                counts = np.diff(t_offsets)[frontier]
                starts = t_offsets[frontier]
                total = int(counts.sum())
                if total == 0:
                    break
                flat = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(counts) - counts, counts)
                    + np.repeat(starts, counts)
                )
                nbr = t_indices[flat]
                ranks = np.repeat(np.arange(len(frontier)), counts)
                new = _first_occurrence_order(nbr, ranks)
                new = new[~row_seen[new]]
                row_seen[new] = True
                row_order[r_ctr:r_ctr + len(new)] = new
                r_ctr += len(new)
                frontier, side = new, "r"
    # isolated columns (no nnz) go last
    if c_ctr < n_cols:
        rest = np.flatnonzero(~col_seen)
        col_order[c_ctr:] = rest
    if r_ctr < n_rows:
        rest = np.flatnonzero(~row_seen)
        row_order[r_ctr:] = rest
    return row_order, col_order


def pseudo_peripheral_levels(offsets, indices, n_rows, n_cols,
                             n_probes=3):
    """BFS level structure from a pseudo-peripheral row (GPS-style):
    BFS from a low-degree row, re-seed at the farthest row found,
    repeat. A DEEP level structure is the backbone of good bandwidth
    orderings — on a randomly permuted band, level order + midpoint
    refinement recovered max tile-span 368 vs 625 for plain CM+
    refinement (r04 measurement). Returns (row_levels, col_levels)."""
    offsets = np.asarray(offsets, np.int64)
    indices = np.asarray(indices, np.int64)
    rows_of = _csr_rows(offsets)
    t_offsets = np.zeros(n_cols + 1, np.int64)
    np.add.at(t_offsets, indices + 1, 1)
    np.cumsum(t_offsets, out=t_offsets)
    t_indices = rows_of[np.argsort(indices, kind="stable")]
    rdeg = np.diff(offsets)

    def bfs(seed_rows):
        rlev = np.full(n_rows, -1, np.int64)
        clev = np.full(n_cols, -1, np.int64)
        rlev[seed_rows] = 0
        frontier, side, lev = seed_rows, "r", 0
        last = seed_rows
        while len(frontier):
            mask = np.zeros(n_cols if side == "r" else n_rows, bool)
            if side == "r":
                for f in frontier:
                    mask[indices[offsets[f]:offsets[f + 1]]] = True
                nbr = np.flatnonzero(mask)
                nbr = nbr[clev[nbr] < 0]
                clev[nbr] = lev
                frontier, side = nbr, "c"
            else:
                for f in frontier:
                    mask[t_indices[t_offsets[f]:t_offsets[f + 1]]] = True
                nbr = np.flatnonzero(mask)
                nbr = nbr[rlev[nbr] < 0]
                lev += 1
                rlev[nbr] = lev
                frontier, side = nbr, "r"
                if len(nbr):
                    last = nbr
        return rlev, clev, last

    nz_rows = np.flatnonzero(rdeg > 0)
    if len(nz_rows) == 0:
        return np.zeros(n_rows, np.int64), np.zeros(n_cols, np.int64)
    seed = np.array([nz_rows[np.argmin(rdeg[nz_rows])]])
    rlev = clev = None
    for _ in range(n_probes):
        rlev, clev, last = bfs(seed)
        seed = np.array([last[int(np.argmin(rdeg[last]))]])
    # unreached components / empty rows+cols: append after the deepest
    deep = max(int(rlev.max()), int(clev.max())) + 1
    rlev = np.where(rlev < 0, deep, rlev)
    clev = np.where(clev < 0, deep, clev)
    return rlev, clev


def bandwidth_permutation(
    offsets: np.ndarray,
    indices: np.ndarray,
    n_rows: int,
    n_cols: int,
    sweeps: int = 10,
    tile: int = 128,
) -> tuple[np.ndarray, np.ndarray]:
    """Return (row_perm, col_perm) such that A[row_perm][:, col_perm]
    has (heuristically) minimal per-tile column windows.

    Barycentric sweeps: row position <- mean(col positions of its nnz);
    column position <- mean(row positions of its nnz); positions are the
    ranks after argsort. Keeps the best ordering seen (including the
    identity) under the band-area cost.
    """
    offsets = np.asarray(offsets, np.int64)
    indices = np.asarray(indices, np.int64)
    nnz = len(indices)
    if nnz == 0 or n_rows == 0 or n_cols == 0:
        return np.arange(n_rows), np.arange(n_cols)

    rows = _csr_rows(offsets)
    row_counts = np.maximum(np.diff(offsets), 1)
    col_counts = np.maximum(np.bincount(indices, minlength=n_cols), 1)

    def _sweep(row_pos, col_pos, n_iter):
        best = None
        for _ in range(n_iter):
            # rows follow their columns
            row_score = np.bincount(
                rows, weights=col_pos[indices], minlength=n_rows
            ) / row_counts
            row_order = np.argsort(row_score, kind="stable")
            row_pos = np.empty(n_rows, np.float64)
            row_pos[row_order] = np.arange(n_rows)
            # columns follow their rows
            col_score = np.bincount(
                indices, weights=row_pos[rows], minlength=n_cols
            ) / col_counts
            col_order = np.argsort(col_score, kind="stable")
            col_pos = np.empty(n_cols, np.float64)
            col_pos[col_order] = np.arange(n_cols)
            best = (row_order, col_order)
        return best

    def _minmax_sweep(rp, cp, n_iter):
        """Bandwidth-targeted refinement: order each side by the
        MIDPOINT (min+max)/2 of its neighbours' positions. Unlike the
        mean (profile-targeted), the midpoint directly shrinks the max
        per-tile window; on a randomly permuted band it cut the max
        width 812 -> 625 on top of CM (r04 measurement)."""
        row_pos = np.empty(n_rows, np.float64)
        row_pos[rp] = np.arange(n_rows)
        col_pos = np.empty(n_cols, np.float64)
        col_pos[cp] = np.arange(n_cols)
        ro, co = rp, cp
        for _ in range(n_iter):
            p = col_pos[indices]
            rmin = np.full(n_rows, np.inf)
            rmax = np.full(n_rows, -np.inf)
            np.minimum.at(rmin, rows, p)
            np.maximum.at(rmax, rows, p)
            with np.errstate(invalid="ignore"):
                rs = np.where(np.isfinite(rmin), (rmin + rmax) / 2,
                              row_pos)
            ro = np.argsort(rs, kind="stable")
            row_pos[ro] = np.arange(n_rows)
            q = row_pos[rows]
            cmin = np.full(n_cols, np.inf)
            cmax = np.full(n_cols, -np.inf)
            np.minimum.at(cmin, indices, q)
            np.maximum.at(cmax, indices, q)
            with np.errstate(invalid="ignore"):
                cs = np.where(np.isfinite(cmin), (cmin + cmax) / 2,
                              col_pos)
            co = np.argsort(cs, kind="stable")
            col_pos[co] = np.arange(n_cols)
        return ro, co

    identity = (np.arange(n_rows), np.arange(n_cols))
    candidates = [identity]
    # seed 1: bipartite Cuthill-McKee (recovers hidden bands exactly)
    cm = cuthill_mckee_permutation(offsets, indices, n_rows, n_cols)
    candidates.append(cm)
    # seed 2: CM refined by bandwidth-targeted midpoint sweeps
    candidates.append(_minmax_sweep(cm[0], cm[1], max(10, sweeps)))
    # seed 3 (usually the winner on permuted bands): pseudo-peripheral
    # BFS level order refined by midpoint sweeps
    try:
        rlev, clev = pseudo_peripheral_levels(offsets, indices, n_rows,
                                              n_cols)
        rdeg = np.diff(offsets)
        cdeg = np.bincount(indices, minlength=n_cols)
        gps = (np.lexsort((rdeg, rlev)), np.lexsort((cdeg, clev)))
        candidates.append(gps)
        candidates.append(_minmax_sweep(gps[0], gps[1],
                                        max(30, 3 * sweeps)))
    except Exception:  # noqa: BLE001 — GPS is a best-effort candidate
        pass
    # seed 3: CM refined by barycentric sweeps
    cm_row_pos = np.empty(n_rows, np.float64)
    cm_row_pos[cm[0]] = np.arange(n_rows)
    cm_col_pos = np.empty(n_cols, np.float64)
    cm_col_pos[cm[1]] = np.arange(n_cols)
    candidates.append(_sweep(cm_row_pos, cm_col_pos, max(2, sweeps // 2)))
    # seed 4: natural order + sweeps
    candidates.append(_sweep(
        np.arange(n_rows, dtype=np.float64),
        np.arange(n_cols, dtype=np.float64), sweeps,
    ))

    best_perm, best_cost = None, np.inf
    for rp, cp in candidates:
        cost = band_cost(offsets, indices, rp, cp, n_rows, n_cols, tile)
        if cost < best_cost:
            best_cost, best_perm = cost, (rp, cp)
    return best_perm


def permute_csr(offsets, indices, values, row_perm, col_perm,
                n_rows, n_cols):
    """CSR of A' = A[row_perm][:, col_perm] (columns renumbered, not
    re-sorted within rows — the slab builder does not need sorted rows)."""
    offsets = np.asarray(offsets, np.int64)
    indices = np.asarray(indices, np.int64)
    inv_col = np.empty(n_cols, np.int64)
    inv_col[col_perm] = np.arange(n_cols)
    new_offsets, src_idx = _gather_rows(offsets, row_perm)
    return new_offsets, inv_col[indices[src_idx]], values[src_idx]
