"""TPU-native sparse linear operators for the constraint matrix A.

The reference uses cusparse CSR SpMV (cpp/src/linear_programming/
cusparse_view.hpp:30) for the PDHG hot pair Ax / A^T y. On TPU there is no
sparse-matmul unit, so the operator is chosen per problem:

  - DenseOp: A stored dense; matvec on the MXU. Best for small/dense
    problems where n_rows * n_cols is modest.
  - EllOp: ELLPACK (padded fixed-width rows) for A and for A^T. Gathers +
    row-sum on the VPU; fully static shapes, XLA-friendly. Best when row
    lengths are fairly uniform.
  - CsrOp: flat nnz gather + segment-sum. O(nnz) regardless of skew; the
    fallback when ELL padding would blow up memory.

All operators are immutable pytrees (flax.struct) so they can be traced
into jitted solvers, vmapped for batch solve, and sharded with
jax.sharding for the multi-chip path.

Scaling helper: every operator supports `rescale(row_scale, col_scale)`
returning a new operator representing diag(r) @ A @ diag(c), used by Ruiz /
Pock-Chambolle equilibration without round-tripping to host.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


class LinearOperator:
    """Interface marker: matvec (A x), rmatvec (A^T y), rescale, abs_max."""


@struct.dataclass
class DenseOp(LinearOperator):
    mat: jax.Array  # (n_rows, n_cols)

    @property
    def shape(self):
        return self.mat.shape

    def matvec(self, x):
        # HIGHEST: XLA's default f32 matmul precision on TPU is bf16
        # passes (measured 1.6e-2 relative error on the r02 bench ops)
        return jnp.dot(self.mat, x, precision=jax.lax.Precision.HIGHEST)

    def rmatvec(self, y):
        return jnp.dot(self.mat.T, y,
                       precision=jax.lax.Precision.HIGHEST)

    def rescale(self, row_scale, col_scale):
        return DenseOp(mat=self.mat * row_scale[:, None] * col_scale[None, :])

    def abs_max(self):
        return jnp.max(jnp.abs(self.mat))

    def row_abs_reduce(self, power):
        """sum_j |a_ij|^power per row."""
        return jnp.sum(jnp.abs(self.mat) ** power, axis=1)

    def col_abs_reduce(self, power):
        return jnp.sum(jnp.abs(self.mat) ** power, axis=0)

    def row_abs_max(self):
        return jnp.max(jnp.abs(self.mat), axis=1)

    def col_abs_max(self):
        return jnp.max(jnp.abs(self.mat), axis=0)


@struct.dataclass
class EllOp(LinearOperator):
    """ELLPACK for A and A^T. Padded entries have value 0 and index 0."""

    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    # row-major ELL of A: (n_rows, Lr)
    row_vals: jax.Array
    row_cols: jax.Array
    # row-major ELL of A^T: (n_cols, Lc)
    col_vals: jax.Array
    col_rows: jax.Array

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def matvec(self, x):
        return jnp.sum(self.row_vals * x[self.row_cols], axis=1)

    def rmatvec(self, y):
        return jnp.sum(self.col_vals * y[self.col_rows], axis=1)

    def rescale(self, row_scale, col_scale):
        return self.replace(
            row_vals=self.row_vals
            * row_scale[:, None]
            * col_scale[self.row_cols],
            col_vals=self.col_vals
            * col_scale[:, None]
            * row_scale[self.col_rows],
        )

    def abs_max(self):
        return jnp.max(jnp.abs(self.row_vals))

    def row_abs_reduce(self, power):
        return jnp.sum(jnp.abs(self.row_vals) ** power, axis=1)

    def col_abs_reduce(self, power):
        return jnp.sum(jnp.abs(self.col_vals) ** power, axis=1)

    def row_abs_max(self):
        return jnp.max(jnp.abs(self.row_vals), axis=1)

    def col_abs_max(self):
        return jnp.max(jnp.abs(self.col_vals), axis=1)


@struct.dataclass
class CsrOp(LinearOperator):
    """Flat gather + segment-sum SpMV; holds both CSR and CSC orderings."""

    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    # CSR ordering (row-sorted)
    csr_vals: jax.Array  # (nnz,)
    csr_rows: jax.Array  # (nnz,) row of each entry, sorted
    csr_cols: jax.Array  # (nnz,)
    # CSC ordering (col-sorted)
    csc_vals: jax.Array
    csc_rows: jax.Array
    csc_cols: jax.Array  # sorted

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def matvec(self, x):
        prod = self.csr_vals * x[self.csr_cols]
        return jax.ops.segment_sum(
            prod, self.csr_rows, num_segments=self.n_rows,
            indices_are_sorted=True,
        )

    def rmatvec(self, y):
        prod = self.csc_vals * y[self.csc_rows]
        return jax.ops.segment_sum(
            prod, self.csc_cols, num_segments=self.n_cols,
            indices_are_sorted=True,
        )

    def rescale(self, row_scale, col_scale):
        return self.replace(
            csr_vals=self.csr_vals
            * row_scale[self.csr_rows]
            * col_scale[self.csr_cols],
            csc_vals=self.csc_vals
            * row_scale[self.csc_rows]
            * col_scale[self.csc_cols],
        )

    def abs_max(self):
        if self.csr_vals.shape[0] == 0:
            return jnp.zeros((), self.csr_vals.dtype)
        return jnp.max(jnp.abs(self.csr_vals))

    def row_abs_reduce(self, power):
        return jax.ops.segment_sum(
            jnp.abs(self.csr_vals) ** power, self.csr_rows,
            num_segments=self.n_rows, indices_are_sorted=True,
        )

    def col_abs_reduce(self, power):
        return jax.ops.segment_sum(
            jnp.abs(self.csc_vals) ** power, self.csc_cols,
            num_segments=self.n_cols, indices_are_sorted=True,
        )

    def row_abs_max(self):
        r = jax.ops.segment_max(
            jnp.abs(self.csr_vals), self.csr_rows,
            num_segments=self.n_rows, indices_are_sorted=True,
        )
        return jnp.maximum(r, 0.0)  # empty rows: segment_max gives -inf

    def col_abs_max(self):
        r = jax.ops.segment_max(
            jnp.abs(self.csc_vals), self.csc_cols,
            num_segments=self.n_cols, indices_are_sorted=True,
        )
        return jnp.maximum(r, 0.0)


@struct.dataclass
class BlockBandOp(LinearOperator):
    """Banded block-dense operator: rows are tiled in groups of `tile`
    (128, the MXU lane width); each row-tile stores a DENSE slab covering
    a column window positioned (densest-window heuristic) over its
    nonzeros. matvec is a batched (T, tile, W) x (T, W) einsum on the MXU
    — no gathers, no segment sums — plus an optional small CSR "spill"
    segment-sum for the few entries that fall outside their tile's window
    (outlier dense rows, coupling constraints).

    This is the TPU-first answer to cusparse CSR SpMV
    (cpp/src/linear_programming/cusparse_view.hpp:30): XLA's generic
    gather costs ~300x speed-of-light on TPU for 1-D scatters/gathers,
    while dense slabs ride the MXU at full HBM bandwidth. Window starts
    are static (computed on host from the sparsity pattern), so x-window
    extraction compiles to contiguous copies. The spill keeps the window
    width at a quantile of per-tile needs instead of the max, so one bad
    row no longer blows up the whole slab; combined with the bandwidth-
    reducing permutation (sparse/reorder.py + PermutedOp) this covers
    general unstructured patterns, not just natively banded ones.

    A transposed band (col-tiles x row windows) of the SAME matrix serves
    rmatvec, with its own independent spill.
    """

    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    tile: int = struct.field(pytree_node=False)
    w_row: int = struct.field(pytree_node=False)  # row-slab window width
    w_col: int = struct.field(pytree_node=False)  # col-slab window width
    row_starts: tuple = struct.field(pytree_node=False)  # (T_r,) static
    col_starts: tuple = struct.field(pytree_node=False)  # (T_c,) static
    row_slabs: jax.Array  # (T_r, tile, w_row)   A row tiles
    col_slabs: jax.Array  # (T_c, tile, w_col)   A^T col tiles
    # spill of A entries outside the row-slab windows (row-sorted COO)
    spill_vals: jax.Array  # (S_r,)
    spill_rows: jax.Array  # (S_r,) int32, sorted
    spill_cols: jax.Array  # (S_r,) int32
    # spill of A^T entries outside the col-slab windows (A^T-row-sorted)
    t_spill_vals: jax.Array  # (S_c,)
    t_spill_rows: jax.Array  # (S_c,) int32 = A columns, sorted
    t_spill_cols: jax.Array  # (S_c,) int32 = A rows
    # Sharded-mesh mode (parallel/sharding.py sets this to the Mesh):
    # extract the per-tile operand windows with ONE static-index gather
    # from an explicitly REPLICATED copy of the operand, instead of T
    # separate slices. Under GSPMD a per-tile slice of a row-sharded
    # vector becomes a collective-permute PER TILE (~176/step measured
    # in the r03 HLO inventory — latency-dominated); the constrained
    # gather form lowers to one all-gather + a local gather, while the
    # sharding constraints stop GSPMD from "solving" the gather by
    # replicating the whole y-space (which would kill scaling).
    mesh: object = struct.field(pytree_node=False, default=None)
    # Fused-attempt halo extension (build_halo_extension): per-device
    # row slabs WIDENED by ty tiles each side so one PDHG attempt needs
    # a single neighbor exchange (see halo_attempt) instead of separate
    # x- and y-halo rounds. halo_meta = (D, Lr, Lc, Hx, Hy, ty) static.
    ext_row_slabs: jax.Array = None   # (D, Tpd + 2*ty, tile, w_row)
    ext_row_starts: jax.Array = None  # (D, Tpd + 2*ty) int32
    halo_meta: tuple = struct.field(pytree_node=False, default=None)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def _windows(self, v, starts, width, total):
        pad = jnp.zeros((width,), v.dtype)
        vp = jnp.concatenate([v, pad])
        if self.mesh is None and len(starts) > 64:
            # one static-index gather instead of T separate slices: the
            # per-tile slice stack dispatches T eager ops per call in
            # the (unjitted) Ruiz scaling loop — 47k dispatches and
            # ~12 s per 250k-row solve before this (r04 profile)
            idx = np.add.outer(np.asarray(starts, np.int64),
                               np.arange(width, dtype=np.int64))
            return vp[jnp.asarray(idx)]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            vp = jax.lax.with_sharding_constraint(
                vp, NamedSharding(self.mesh, P())
            )
            idx = np.add.outer(np.asarray(starts, np.int32),
                               np.arange(width, dtype=np.int32))
            win = vp[jnp.asarray(idx)]
            axis = self.mesh.axis_names[0]
            return jax.lax.with_sharding_constraint(
                win, NamedSharding(self.mesh, P(axis, None))
            )
        return jnp.stack(
            [jax.lax.slice(vp, (s,), (s + width,)) for s in starts]
        )

    # ------------------------------------------------- sharded fast path
    def _halo_reach(self, starts, width, v_total, D):
        """Static max reach of any device's windows beyond its own block
        of the operand vector; None when a window breaks locality (then
        the all-gather window form serves instead)."""
        T = len(starts)
        per = T // D
        L = v_total // D
        H = 0
        for d in range(D):
            ss = starts[d * per:(d + 1) * per]
            if ss:
                H = max(H, d * L - min(ss),
                        max(s + width for s in ss) - (d + 1) * L)
        H = max(H, 0)
        return H if H <= L else None

    def _halo_apply(self, v, slabs, starts, width, v_total, out_total):
        """Banded SpMV over the mesh with an explicit fixed-size halo
        exchange (jax.shard_map): device d owns a contiguous block of
        128-row tiles and of the operand vector; two neighbor
        ppermutes of H elements replace the full-vector all-gather —
        per-step ICI bytes become SIZE-INDEPENDENT (the band-parallel
        design of the BASELINE.json weak-scaling north star). Returns
        the sharded output rows, or None when the static gates
        (divisibility, window locality) fail."""
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        axis = mesh.axis_names[0]
        D = int(mesh.devices.size)
        T = len(starts)
        if D <= 1 or T % D or v_total % D or out_total % (self.tile * D) \
                or out_total != T * self.tile:
            return None
        H = self._halo_reach(starts, width, v_total, D)
        if H is None:
            return None
        L = v_total // D
        starts_arr = jnp.asarray(starts, jnp.int32)

        def body(v_loc, slabs_loc, starts_loc):
            d = jax.lax.axis_index(axis)
            if H:
                fwd = [(i, i + 1) for i in range(D - 1)]
                bwd = [(i + 1, i) for i in range(D - 1)]
                left = jax.lax.ppermute(v_loc[-H:], axis, fwd)
                right = jax.lax.ppermute(v_loc[:H], axis, bwd)
                parts = [left, v_loc, right]
            else:
                parts = [v_loc]
            v_ext = jnp.concatenate(
                parts + [jnp.zeros((width,), v_loc.dtype)]
            )
            off = starts_loc - d * jnp.int32(L) + jnp.int32(H)
            idx = off[:, None] + jnp.arange(width, dtype=jnp.int32)[None]
            win = v_ext[idx]                      # (T/D, width)
            out = jnp.einsum(
                "trw,tw->tr", slabs_loc, win,
                preferred_element_type=slabs_loc.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.reshape(-1)                # (out_total/D,)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis, None, None), P(axis)),
            out_specs=P(axis),
        )(v, slabs, starts_arr)

    def build_halo_extension(self):
        """Precompute the single-exchange attempt layout (host side;
        requires `mesh` already set). Returns a new op with
        ext_row_slabs / ext_row_starts / halo_meta populated, or `self`
        unchanged when a static gate fails (the caller falls back to
        the two-exchange GSPMD path).

        Layout: device d owns rows [d*Lr, (d+1)*Lr) and cols
        [d*Lc, (d+1)*Lc). Its col tiles read y over at most Hy = ty*tile
        rows beyond the block, so the attempt computes y_new REDUNDANTLY
        on those rows, which needs ax_new there, which needs the row
        slabs for ty extra tiles per side (stored here, zero-padded at
        the boundary) and x_new over an Hx-wide column halo."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        if mesh is None:
            return self
        D = int(mesh.devices.size)
        tile = self.tile
        T = len(self.row_starts)
        Tc = len(self.col_starts)
        if (D <= 1 or self.n_rows % (tile * D) or self.n_cols % D
                or T % D or self.n_rows != T * tile
                or Tc % D or self.n_cols != Tc * tile
                or self.spill_vals.shape[0]
                or self.t_spill_vals.shape[0]):
            return self
        Lr = self.n_rows // D
        Lc = self.n_cols // D
        Hcol = self._halo_reach(self.col_starts, self.w_col,
                                self.n_rows, D)
        if Hcol is None:
            return self
        ty = -(-Hcol // tile)
        Hy = ty * tile
        if Hy > Lr:
            return self
        Tpd = T // D
        rs = np.asarray(self.row_starts, np.int64)
        slabs = np.asarray(self.row_slabs)
        ext_slabs = np.zeros((D, Tpd + 2 * ty, tile, self.w_row),
                             slabs.dtype)
        ext_starts = np.zeros((D, Tpd + 2 * ty), np.int32)
        Hx = 0
        for d in range(D):
            lo_t, hi_t = d * Tpd - ty, (d + 1) * Tpd + ty
            for p, t in enumerate(range(lo_t, hi_t)):
                if 0 <= t < T:
                    ext_slabs[d, p] = slabs[t]
                    ext_starts[d, p] = rs[t]
                    Hx = max(Hx, d * Lc - int(rs[t]),
                             int(rs[t]) + self.w_row - (d + 1) * Lc)
        Hx = max(Hx, 0)
        if Hx > Lc:
            return self
        row4 = NamedSharding(mesh, P(mesh.axis_names[0],
                                     None, None, None))
        row2 = NamedSharding(mesh, P(mesh.axis_names[0], None))
        return self.replace(
            ext_row_slabs=jax.device_put(jnp.asarray(ext_slabs), row4),
            ext_row_starts=jax.device_put(jnp.asarray(ext_starts),
                                          row2),
            halo_meta=(D, Lr, Lc, Hx, Hy, ty),
        )

    def matvec(self, x):
        out = None
        if self.mesh is not None:
            out = self._halo_apply(x, self.row_slabs, self.row_starts,
                                   self.w_row, self.n_cols, self.n_rows)
        if out is None:
            xw = self._windows(x, self.row_starts, self.w_row,
                               self.n_cols)
            out = jnp.einsum(
                "trw,tw->tr", self.row_slabs, xw,
                preferred_element_type=self.row_slabs.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            out = out.reshape(-1)[: self.n_rows]
        if self.spill_vals.shape[0]:
            out = out + jax.ops.segment_sum(
                self.spill_vals * x[self.spill_cols], self.spill_rows,
                num_segments=self.n_rows, indices_are_sorted=True,
            )
        return out

    def rmatvec(self, y):
        out = None
        if self.mesh is not None:
            out = self._halo_apply(y, self.col_slabs, self.col_starts,
                                   self.w_col, self.n_rows, self.n_cols)
        if out is None:
            yw = self._windows(y, self.col_starts, self.w_col,
                               self.n_rows)
            out = jnp.einsum(
                "trw,tw->tr", self.col_slabs, yw,
                preferred_element_type=self.col_slabs.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            out = out.reshape(-1)[: self.n_cols]
        if self.t_spill_vals.shape[0]:
            out = out + jax.ops.segment_sum(
                self.t_spill_vals * y[self.t_spill_cols],
                self.t_spill_rows,
                num_segments=self.n_cols, indices_are_sorted=True,
            )
        return out

    def _scatter_cols(self, partials, starts, width, total):
        """Sum per-tile window reductions back onto the full axis.
        Windows can overlap, so accumulate tile by tile (host-unrolled:
        runs once per solve during scaling)."""
        out = jnp.zeros((total + width,), partials.dtype)
        for t, s in enumerate(starts):
            seg = jax.lax.dynamic_slice(out, (s,), (width,))
            out = jax.lax.dynamic_update_slice(out, seg + partials[t], (s,))
        return out[:total]

    def rescale(self, row_scale, col_scale):
        rw = self._windows(
            col_scale, self.row_starts, self.w_row, self.n_cols
        )
        rs_pad = jnp.concatenate([
            row_scale, jnp.zeros((self.row_slabs.shape[0] * self.tile
                                  - self.n_rows,), row_scale.dtype)
        ]).reshape(-1, self.tile)
        cw = self._windows(
            row_scale, self.col_starts, self.w_col, self.n_rows
        )
        cs_pad = jnp.concatenate([
            col_scale, jnp.zeros((self.col_slabs.shape[0] * self.tile
                                  - self.n_cols,), col_scale.dtype)
        ]).reshape(-1, self.tile)
        new = self.replace(
            row_slabs=self.row_slabs * rs_pad[:, :, None] * rw[:, None, :],
            col_slabs=self.col_slabs * cs_pad[:, :, None] * cw[:, None, :],
        )
        if self.spill_vals.shape[0]:
            new = new.replace(
                spill_vals=self.spill_vals
                * row_scale[self.spill_rows]
                * col_scale[self.spill_cols],
            )
        if self.t_spill_vals.shape[0]:
            new = new.replace(
                t_spill_vals=self.t_spill_vals
                * col_scale[self.t_spill_rows]
                * row_scale[self.t_spill_cols],
            )
        return new

    def abs_max(self):
        m = jnp.max(jnp.abs(self.row_slabs))
        if self.spill_vals.shape[0]:
            m = jnp.maximum(m, jnp.max(jnp.abs(self.spill_vals)))
        return m

    def row_abs_reduce(self, power):
        r = jnp.sum(jnp.abs(self.row_slabs) ** power, axis=2)
        r = r.reshape(-1)[: self.n_rows]
        if self.spill_vals.shape[0]:
            r = r + jax.ops.segment_sum(
                jnp.abs(self.spill_vals) ** power, self.spill_rows,
                num_segments=self.n_rows, indices_are_sorted=True,
            )
        return r

    def col_abs_reduce(self, power):
        r = jnp.sum(jnp.abs(self.col_slabs) ** power, axis=2)
        r = r.reshape(-1)[: self.n_cols]
        if self.t_spill_vals.shape[0]:
            r = r + jax.ops.segment_sum(
                jnp.abs(self.t_spill_vals) ** power, self.t_spill_rows,
                num_segments=self.n_cols, indices_are_sorted=True,
            )
        return r

    def row_abs_max(self):
        r = jnp.max(jnp.abs(self.row_slabs), axis=2)
        r = r.reshape(-1)[: self.n_rows]
        if self.spill_vals.shape[0]:
            r = jnp.maximum(r, jnp.maximum(jax.ops.segment_max(
                jnp.abs(self.spill_vals), self.spill_rows,
                num_segments=self.n_rows, indices_are_sorted=True,
            ), 0.0))
        return r

    def col_abs_max(self):
        r = jnp.max(jnp.abs(self.col_slabs), axis=2)
        r = r.reshape(-1)[: self.n_cols]
        if self.t_spill_vals.shape[0]:
            r = jnp.maximum(r, jnp.maximum(jax.ops.segment_max(
                jnp.abs(self.t_spill_vals), self.t_spill_rows,
                num_segments=self.n_cols, indices_are_sorted=True,
            ), 0.0))
        return r


def halo_attempt(op: BlockBandOp, x, aty, c, lv, uv, ax, y,
                 lc0m, uc0m, tau, sigma, omega):
    """One full PDHG attempt with a SINGLE neighbor halo exchange.

    The two-exchange form (x-halo before A x_new, y-halo before
    A^T y_new) costs 4 collective-permutes + 1 packed all-reduce per
    step — 5.33 collectives/step in the WEAKSCALING_r05 HLO inventory,
    the dominant ICI-latency term of the weak-scaling model. Here the
    halos of (x, aty, c, lv, uv) and (ax, y, lc0m, uc0m) ride ONE
    concatenated ppermute per direction at attempt start; y_new is then
    computed REDUNDANTLY on the Hy extended rows (using the pre-widened
    `ext_row_slabs`), so A^T needs no second exchange: 2 permutes +
    1 all-reduce = ~3 collectives/step.

    Returns (x_new, y_new, ax_new, aty_new, sums) with sums the packed
    scalar reductions [dx.dx, x_new.x_new, dy.dy, dy.(ax_new-ax),
    y_new.y_new] (replicated). Inputs are P(axis)-sharded vectors;
    tau/sigma/omega replicated scalars. lc0m/uc0m are the
    sentinel-masked row bounds (infinite sides pushed to +-sent).
    """
    from jax.sharding import PartitionSpec as P

    mesh = op.mesh
    axis = mesh.axis_names[0]
    D, Lr, Lc, Hx, Hy, ty = op.halo_meta
    tile, w_row, w_col = op.tile, op.w_row, op.w_col
    col_starts = jnp.asarray(op.col_starts, jnp.int32)

    def body(x, aty, c, lv, uv, ax, y, lc0m, uc0m,
             eslabs, estarts, cslabs, cstarts, tau, sigma, omega):
        d = jax.lax.axis_index(axis)
        eslabs = eslabs[0]
        estarts = estarts[0]
        fwd = [(i, i + 1) for i in range(D - 1)]
        bwd = [(i + 1, i) for i in range(D - 1)]
        xs = (x, aty, c, lv, uv)
        ys = (ax, y, lc0m, uc0m)
        tails = [v[-Hx:] for v in xs] + [v[-Hy:] for v in ys]
        heads = [v[:Hx] for v in xs] + [v[:Hy] for v in ys]
        left = jax.lax.ppermute(jnp.concatenate(tails), axis, fwd)
        right = jax.lax.ppermute(jnp.concatenate(heads), axis, bwd)

        def split(buf):
            outs, o = [], 0
            for v in xs:
                outs.append(buf[o:o + Hx]); o += Hx
            for v in ys:
                outs.append(buf[o:o + Hy]); o += Hy
            return outs

        L5, R5 = split(left), split(right)
        def ext(i, v, H):
            return jnp.concatenate([L5[i], v, R5[i]]) if H else v

        x_e, aty_e, c_e, lv_e, uv_e = (
            ext(i, v, Hx) for i, v in enumerate(xs))
        ax_e, y_e, lc0m_e, uc0m_e = (
            ext(5 + i, v, Hy) for i, v in enumerate(ys))

        # primal step on the extended column range
        x_new_e = jnp.clip(x_e - tau * (c_e - aty_e), lv_e, uv_e)
        # A x_new over the widened row tiles (zero slabs at boundary)
        vp = jnp.concatenate([x_new_e, jnp.zeros((w_row,), x.dtype)])
        off = estarts - (d * jnp.int32(Lc) - jnp.int32(Hx))
        idx = off[:, None] + jnp.arange(w_row, dtype=jnp.int32)[None]
        win = vp[idx]
        ax_new_e = jnp.einsum(
            "trw,tw->tr", eslabs, win,
            preferred_element_type=eslabs.dtype,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(-1)                       # (Lr + 2*Hy,)
        # dual prox on the extended row range
        ax_tilde = 2.0 * ax_new_e - ax_e
        y_low = y_e + sigma * (lc0m_e - ax_tilde)
        y_high = y_e + sigma * (uc0m_e - ax_tilde)
        y_new_e = jnp.where(
            y_low > 0.0, y_low, jnp.where(y_high < 0.0, y_high, 0.0)
        )
        # A^T y_new over OWN col tiles reading the extended y
        vp2 = jnp.concatenate([y_new_e, jnp.zeros((w_col,), y.dtype)])
        off2 = cstarts - (d * jnp.int32(Lr) - jnp.int32(Hy))
        idx2 = off2[:, None] + jnp.arange(w_col, dtype=jnp.int32)[None]
        aty_new = jnp.einsum(
            "trw,tw->tr", cslabs, vp2[idx2],
            preferred_element_type=cslabs.dtype,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(-1)[:Lc]
        # owned slices + the packed scalar reductions (ONE all-reduce)
        x_new = x_new_e[Hx:Hx + Lc] if Hx else x_new_e
        ax_new = ax_new_e[Hy:Hy + Lr] if Hy else ax_new_e
        y_new = y_new_e[Hy:Hy + Lr] if Hy else y_new_e
        dx = x_new - x
        dy = y_new - y
        parts = jnp.stack([
            jnp.dot(dx, dx), jnp.dot(x_new, x_new), jnp.dot(dy, dy),
            jnp.dot(dy, ax_new - ax), jnp.dot(y_new, y_new),
        ])
        sums = jax.lax.psum(parts, axis)
        return x_new, y_new, ax_new, aty_new, sums

    pA = P(axis)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pA, pA, pA, pA, pA, pA, pA, pA, pA,
                  P(axis, None, None, None), P(axis, None),
                  P(axis, None, None), pA, P(), P(), P()),
        out_specs=(pA, pA, pA, pA, P()),
        check_vma=False,
    )(x, aty, c, lv, uv, ax, y, lc0m, uc0m,
      op.ext_row_slabs, op.ext_row_starts, op.col_slabs, col_starts,
      tau, sigma, omega)


@struct.dataclass
class PermutedOp(LinearOperator):
    """A under a bandwidth-reducing row/column permutation:
    inner = A[row_perm][:, col_perm] (a BlockBandOp). The wrapper routes
    matvec/rmatvec through O(m+n) gathers — negligible next to the SpMV —
    so the MXU slab path serves matrices that are only bandable after
    reordering (sparse/reorder.py). Reference counterpart: cusparse CSR
    SpMV needs no reordering on GPU; on TPU this is the general-pattern
    fast path."""

    inner: BlockBandOp
    row_perm: jax.Array      # (n,) int32: inner row i = A row row_perm[i]
    inv_row_perm: jax.Array  # (n,) int32
    col_perm: jax.Array      # (m,) int32
    inv_col_perm: jax.Array  # (m,) int32

    @property
    def shape(self):
        return self.inner.shape

    def matvec(self, x):
        return self.inner.matvec(x[self.col_perm])[self.inv_row_perm]

    def rmatvec(self, y):
        return self.inner.rmatvec(y[self.row_perm])[self.inv_col_perm]

    def rescale(self, row_scale, col_scale):
        return self.replace(inner=self.inner.rescale(
            row_scale[self.row_perm], col_scale[self.col_perm]
        ))

    def abs_max(self):
        return self.inner.abs_max()

    def row_abs_reduce(self, power):
        return self.inner.row_abs_reduce(power)[self.inv_row_perm]

    def col_abs_reduce(self, power):
        return self.inner.col_abs_reduce(power)[self.inv_col_perm]

    def row_abs_max(self):
        return self.inner.row_abs_max()[self.inv_row_perm]

    def col_abs_max(self):
        return self.inner.col_abs_max()[self.inv_col_perm]


_ALIGN = 128  # lane width: window starts are 128-aligned so the Pallas
# fused-PDHG kernel (lp/pdhg_pallas.py) slices x / accumulates A^T y at
# aligned lane offsets (unaligned cross-lane slices force relayouts)


def _tile_windows(offsets, indices, n_axis, tile, W):
    """Per-tile window starts for width W, placed on the densest
    128-ALIGNED window of each tile's (sorted) column indices.
    Returns (starts (T,), inside mask over nnz)."""
    T = (n_axis + tile - 1) // tile
    starts = np.zeros(T, np.int64)
    inside = np.zeros(offsets[-1], bool)
    for t in range(T):
        a = int(offsets[min(t * tile, n_axis)])
        b = int(offsets[min((t + 1) * tile, n_axis)])
        if b <= a:
            continue
        seg = np.sort(indices[a:b])
        lo = (int(seg[0]) // _ALIGN) * _ALIGN
        if int(seg[-1]) - lo < W:
            s = lo
        else:
            # candidate aligned starts; count coverage via two pointers
            cand = np.unique((seg // _ALIGN) * _ALIGN)
            jj = np.searchsorted(seg, cand + W, side="left")
            ii = np.searchsorted(seg, cand, side="left")
            s = int(cand[int(np.argmax(jj - ii))])
        starts[t] = s
        inside[a:b] = (indices[a:b] >= s) & (indices[a:b] < s + W)
    return starts, inside


def _band_slabs(offsets, indices, values, n_axis, n_other, tile,
                np_dtype, spill_frac=0.15, transposed=False):
    """Slab decomposition of a CSR matrix along `n_axis` rows.

    Picks the narrowest window width W (multiple of `tile`) such that the
    out-of-window spill stays under spill_frac * nnz, trying the full
    width first (zero spill) and then per-tile-width quantiles. Returns
    (slabs (T, tile, W) — or (T, W, tile) when `transposed` — starts
    tuple, W, (spill_vals, spill_rows, spill_cols)) or None if every
    candidate blows the slab budget. (A transposed row layout was tried
    in r04 and measured 2.6x SLOWER end-to-end on the fused kernel —
    the lane-lane MXU contraction + sublane-broadcast multiply lower
    poorly on this Mosaic toolchain; keep (T, tile, W).)"""
    T = (n_axis + tile - 1) // tile
    nnz = len(values)
    # slab budget: up to ~256 stored elements per nonzero (zero-spill
    # windows are worth substantial padding — see spill pricing below).
    # Byte budget sized for HBM-resident slabs at cuOpt-class problem
    # scale: a 1M x 1M, 50M-nnz LP needs ~1.5 GB of W=384 row slabs
    # (the old 512 MB cap silently dropped such instances to the ELL
    # gather path — 0.4 it/s vs hundreds on the slab path); v5e HBM is
    # 16 GB, and the two slab sides plus vectors fit comfortably.
    elem_budget = max(256 * max(nnz, 1), 1 << 22)
    byte_budget = 3 << 30
    rows = np.repeat(np.arange(n_axis, dtype=np.int64), np.diff(offsets))

    # per-tile full window widths
    full_w = np.zeros(T, np.int64)
    for t in range(T):
        a = int(offsets[min(t * tile, n_axis)])
        b = int(offsets[min((t + 1) * tile, n_axis)])
        if b > a:
            seg = indices[a:b]
            # width needed from a 128-aligned start (see _tile_windows)
            full_w[t] = int(seg.max()) - (int(seg.min()) // _ALIGN) * _ALIGN + 1

    def _round(w):
        return max(tile, ((int(w) + tile - 1) // tile) * tile)

    nz_w = full_w[full_w > 0]
    cands = [_round(full_w.max() if T else tile)]
    if len(nz_w):
        for q in (0.95, 0.85, 0.7, 0.5):
            cands.append(_round(np.quantile(nz_w, q)))
    # geometric ladder: quantiles of full widths are poisoned when outlier
    # entries stretch many tiles' windows; the ladder + min-cost selection
    # still finds a narrow window + spill decomposition in that case
    w = tile
    w_max = elem_budget // max(T * tile, 1)
    while w <= min(w_max, max(int(full_w.max()) if T else tile, tile)):
        cands.append(w)
        w *= 4
    # always offer the fast-rate widths (see cost model below)
    cands.extend([256, 384, 512])
    # Pick the candidate minimizing modeled wall time, in slab-element
    # units at the W<=512 stream rate. r04 measurements on the real
    # chip (same matrix, zero spill): W=512 streams at 418 GB/s but
    # W>=640 collapses to ~200 GB/s (a hard Mosaic pipeline cliff,
    # robust to chunked DMA / compute stubs / vmem hints) -> elements
    # beyond 512 lanes cost ~2.2x. Spill pricing: measured ~31 ns per
    # spill entry end-to-end (XLA 1-D gather+segment-sum) vs ~9.6 ps
    # per slab element -> ~3200 element-units per entry.
    SPILL_COST = 3200
    WIDE_RATE_PENALTY = 2.2
    chosen, best_cost = None, np.inf
    for W in sorted(set(cands), reverse=True):
        slab_elems = T * tile * W
        if slab_elems > elem_budget or \
                slab_elems * np.dtype(np_dtype).itemsize > byte_budget:
            continue
        starts, inside = _tile_windows(offsets, indices, n_axis, tile, W)
        n_spill = int((~inside).sum())
        if n_spill > spill_frac * max(nnz, 1):
            continue
        rate = 1.0 if W <= 512 else WIDE_RATE_PENALTY
        cost = slab_elems * rate + SPILL_COST * n_spill
        if cost < best_cost:
            best_cost = cost
            chosen = (W, starts, inside)
    if chosen is None:
        return None
    W, starts, inside = chosen

    shape = (T, W, tile) if transposed else (T, tile, W)
    slabs = np.zeros(shape, np_dtype)
    if nnz:
        t_of = rows // tile
        r_in = rows % tile
        local = indices - starts[t_of]
        idx = (t_of[inside], local[inside], r_in[inside]) if transposed \
            else (t_of[inside], r_in[inside], local[inside])
        np.add.at(slabs, idx, values[inside])
    out = ~inside
    spill = (
        values[out].astype(np_dtype),
        rows[out].astype(np.int32),
        indices[out].astype(np.int32),
    )
    return slabs, tuple(int(s) for s in starts), W, spill


def build_block_band(offsets, indices, values, n_rows, n_cols, dtype,
                     tile=128, spill_frac=0.15):
    """Build a BlockBandOp, or None when the matrix has no usable band
    structure (window blow-up guard in _band_slabs)."""
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    row = _band_slabs(offsets, indices, values, n_rows, n_cols, tile,
                      np_dtype, spill_frac)
    if row is None:
        return None
    t_offsets, t_indices, t_values, _ = _transpose_csr(
        offsets, indices, values, n_rows, n_cols
    )
    col = _band_slabs(t_offsets, t_indices, t_values, n_cols, n_rows,
                      tile, np_dtype, spill_frac)
    if col is None:
        return None
    row_slabs, row_starts, w_row, (sv, sr, sc) = row
    col_slabs, col_starts, w_col, (tv, tr, tc) = col
    return BlockBandOp(
        n_rows=n_rows, n_cols=n_cols, tile=tile,
        w_row=w_row, w_col=w_col,
        row_starts=row_starts, col_starts=col_starts,
        row_slabs=jnp.asarray(row_slabs, dtype),
        col_slabs=jnp.asarray(col_slabs, dtype),
        spill_vals=jnp.asarray(sv, dtype),
        spill_rows=jnp.asarray(sr),
        spill_cols=jnp.asarray(sc),
        t_spill_vals=jnp.asarray(tv, dtype),
        t_spill_rows=jnp.asarray(tr),
        t_spill_cols=jnp.asarray(tc),
    )


def build_permuted_band(offsets, indices, values, n_rows, n_cols, dtype,
                        tile=128, spill_frac=0.15):
    """Bandwidth-reduce via row/col permutation (sparse/reorder.py), then
    build the slab operator on the permuted matrix. Returns a PermutedOp
    or None when even the permuted pattern has no usable band."""
    from cuopt_tpu.sparse.reorder import (
        bandwidth_permutation,
        permute_csr,
    )

    rp, cp = bandwidth_permutation(offsets, indices, n_rows, n_cols,
                                   tile=tile)
    if np.array_equal(rp, np.arange(n_rows)) and \
            np.array_equal(cp, np.arange(n_cols)):
        return None  # permutation found nothing better than identity
    p_offsets, p_indices, p_values = permute_csr(
        offsets, indices, values, rp, cp, n_rows, n_cols
    )
    inner = build_block_band(p_offsets, p_indices, p_values, n_rows,
                             n_cols, dtype, tile, spill_frac)
    if inner is None:
        return None
    inv_rp = np.empty(n_rows, np.int64)
    inv_rp[rp] = np.arange(n_rows)
    inv_cp = np.empty(n_cols, np.int64)
    inv_cp[cp] = np.arange(n_cols)
    return PermutedOp(
        inner=inner,
        row_perm=jnp.asarray(rp, jnp.int32),
        inv_row_perm=jnp.asarray(inv_rp, jnp.int32),
        col_perm=jnp.asarray(cp, jnp.int32),
        inv_col_perm=jnp.asarray(inv_cp, jnp.int32),
    )


# --------------------------------------------------------------------- build
def _csr_to_ell(offsets, indices, values, n_rows, width, dtype):
    counts = np.diff(offsets)
    ell_vals = np.zeros((n_rows, width), dtype)
    ell_idx = np.zeros((n_rows, width), np.int32)
    # vectorized fill: position of each nnz within its row
    if len(values):
        pos_in_row = np.arange(len(values)) - np.repeat(offsets[:-1], counts)
        rows = np.repeat(np.arange(n_rows), counts)
        ell_vals[rows, pos_in_row] = values
        ell_idx[rows, pos_in_row] = indices
    return ell_vals, ell_idx


def _transpose_csr(offsets, indices, values, n_rows, n_cols):
    """CSR -> CSC (i.e. CSR of A^T) on host."""
    nnz = len(values)
    rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
    order = np.argsort(indices, kind="stable")
    t_offsets = np.zeros(n_cols + 1, np.int64)
    np.add.at(t_offsets, indices + 1, 1)
    np.cumsum(t_offsets, out=t_offsets)
    return t_offsets, rows[order], values[order], nnz


def build_operator(
    offsets: np.ndarray,
    indices: np.ndarray,
    values: np.ndarray,
    n_rows: int,
    n_cols: int,
    dtype=jnp.float64,
    kind: str = "auto",
    ell_padding_limit: float = 4.0,
    dense_size_limit: int = 1 << 22,
) -> LinearOperator:
    """Build the best operator for this sparsity pattern.

    kind: 'auto' | 'dense' | 'blockband' | 'ell' | 'csr'.
    auto: dense if n_rows*n_cols small; else blockband when the sparsity
    has usable band/staircase structure (MXU path, no gathers); else ELL
    when padded size is within ell_padding_limit x nnz; else CSR
    segment-sum.
    """
    offsets = np.asarray(offsets, np.int64)
    indices = np.asarray(indices, np.int64)
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    values = np.asarray(values, np_dtype)
    nnz = len(values)

    if kind in ("auto", "blockband", "bandperm") and n_rows > 0 and \
            n_cols > 0 and \
            not (kind == "auto" and n_rows * n_cols <= dense_size_limit):
        if kind != "bandperm":
            op = build_block_band(
                offsets, indices, values, n_rows, n_cols, dtype
            )
            if op is not None:
                return op
        if kind in ("auto", "bandperm"):
            op = build_permuted_band(
                offsets, indices, values, n_rows, n_cols, dtype
            )
            if op is not None:
                return op
        if kind == "blockband":
            raise ValueError(
                "matrix has no usable band structure for 'blockband'"
            )
        if kind == "bandperm":
            raise ValueError(
                "matrix has no usable band structure even after "
                "bandwidth-reducing permutation"
            )

    if kind == "auto":
        if n_rows * n_cols <= dense_size_limit:
            kind = "dense"
        else:
            max_row = int(np.max(np.diff(offsets), initial=0))
            t_offsets, _, _, _ = _transpose_csr(
                offsets, indices, values, n_rows, n_cols
            )
            max_col = int(np.max(np.diff(t_offsets), initial=0))
            padded = n_rows * max_row + n_cols * max_col
            kind = "ell" if padded <= ell_padding_limit * 2 * max(nnz, 1) \
                else "csr"

    if kind == "dense":
        A = np.zeros((n_rows, n_cols), np_dtype)
        if nnz:
            rows = np.repeat(
                np.arange(n_rows, dtype=np.int64), np.diff(offsets)
            )
            np.add.at(A, (rows, indices), values)
        return DenseOp(mat=jnp.asarray(A, dtype))

    t_offsets, t_indices, t_values, _ = _transpose_csr(
        offsets, indices, values, n_rows, n_cols
    )
    if kind == "ell":
        wr = max(int(np.max(np.diff(offsets), initial=0)), 1)
        wc = max(int(np.max(np.diff(t_offsets), initial=0)), 1)
        rv, ri = _csr_to_ell(offsets, indices, values, n_rows, wr, np_dtype)
        cv, ci = _csr_to_ell(
            t_offsets, t_indices, t_values, n_cols, wc, np_dtype
        )
        return EllOp(
            n_rows=n_rows, n_cols=n_cols,
            row_vals=jnp.asarray(rv, dtype), row_cols=jnp.asarray(ri),
            col_vals=jnp.asarray(cv, dtype), col_rows=jnp.asarray(ci),
        )
    if kind == "csr":
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
        csc_rows = t_indices
        csc_cols = np.repeat(
            np.arange(n_cols, dtype=np.int64), np.diff(t_offsets)
        )
        return CsrOp(
            n_rows=n_rows, n_cols=n_cols,
            csr_vals=jnp.asarray(values, dtype),
            csr_rows=jnp.asarray(rows, np.int32),
            csr_cols=jnp.asarray(indices, np.int32),
            csc_vals=jnp.asarray(t_values, dtype),
            csc_rows=jnp.asarray(csc_rows, np.int32),
            csc_cols=jnp.asarray(csc_cols, np.int32),
        )
    raise ValueError(f"unknown operator kind {kind!r}")
