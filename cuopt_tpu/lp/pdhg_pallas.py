"""Fused PDHG step as a Pallas TPU kernel over BlockBandOp row slabs.

The reference amortizes the PDHG step's kernel launches with ping-pong CUDA
graphs (cpp/src/linear_programming/utilities/ping_pong_graph.cuh:29;
pdhg.cu:88-200 does SpMV Ax -> primal projection -> SpMV A^T y -> dual
update as separate cusparse/thrust launches). On TPU we can go further
than a graph: because the PDLP dual proximal step is ELEMENTWISE in the
constraint index, the whole

    Ax_new  ->  y_new = prox(y, Ax~)  ->  A^T y_new

chain is computable in ONE streaming pass over the row slabs of A:
for each 128-row tile we (a) matvec the tile's dense slab against the
x window, (b) apply the two-sided dual prox for those 128 rows, and
(c) immediately accumulate the tile's contribution y_tile^T A_tile into
an A^T y accumulator held in VMEM. A is read ONCE per PDHG iteration
instead of twice (row slabs for Ax + col slabs for A^T y), halving HBM
traffic on the bandwidth-bound hot loop — the TPU analogue of cuOpt's
"PDHG step at memory speed-of-light" goal (BASELINE.json north star).

Requires the 128-aligned window starts produced by sparse/ops.py
(_tile_windows): x-window loads and A^T y window accumulations are then
lane-aligned vector ops. Entries outside the slab windows (spill) are
handled by the caller in XLA: the Ax spill is computed from x_new BEFORE
the kernel (y_new needs the full row activity), the A^T y spill from
y_new AFTER it.

float32 only: TPU VPU/MXU have no native f64; the f64 path keeps the
XLA matvec/rmatvec pair (lp/pdlp.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget gate: x_new + aty accumulator + slab double-buffer must fit.
_VMEM_VECTOR_LIMIT = 2 << 20  # max n_cols_pad elements (8 MB of f32)


def fused_pass_supported(op, dtype, interpret_ok: bool = True) -> bool:
    """Whether the fused row-pass kernel can serve this operator/dtype."""
    from cuopt_tpu.sparse.ops import BlockBandOp

    if not isinstance(op, BlockBandOp):
        return False
    if getattr(op, "mesh", None) is not None:
        return False  # sharded path: the halo-exchange shard_map SpMV
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if op.tile != 128 or any(s % 128 for s in op.row_starts):
        return False
    n_cols_pad = _col_pad(op)
    if n_cols_pad > _VMEM_VECTOR_LIMIT:
        return False
    if jax.default_backend() != "tpu" and not interpret_ok:
        return False
    return True


def _col_pad(op) -> int:
    W = op.w_row
    max_end = max((s + W for s in op.row_starts), default=W)
    return max(max_end, -(-op.n_cols // 128) * 128)


_G = 8  # row tiles per grid step: row-space vectors then flow through
# full (8, 128) vregs and their specs become static (8, 128) blocks;
# per-(1,128)-op overhead and dynamic row indexing were the bottleneck
# (measured 1.5us/tile with G=1, ~6x over the DMA floor)

# Max lanes per slab DMA chunk. Measured on the real chip (r04, same
# matrix, zero spill): W=384 -> 376 GB/s, W=512 -> 418 GB/s, W=640 ->
# 195 GB/s — block fetches beyond (G,128,512) ~ 2.1 MB collapse the
# pipeline's effective DMA rate by ~2x. Wider windows are therefore
# streamed as MULTIPLE <=512-lane chunks of the same array (separate
# BlockSpecs over identical data), keeping every fetch under the cliff.
_W_CHUNK = 512


def _chunk_widths(W):
    """Equal-width chunks: the largest 128-multiple divisor of W that
    stays under _W_CHUNK (equal widths keep every chunk's lane offset
    divisible by its width, as BlockSpec index units require)."""
    WB = W // 128
    best = 1
    for k in range(1, WB + 1):
        if WB % k == 0 and k * 128 <= _W_CHUNK:
            best = k
    wc = best * 128
    return tuple([wc] * (W // wc))


def _kernel(starts_ref, sigma_ref, *refs, W):
    """Grid step g = _G row tiles (128 rows each).

    `refs` = [slab_chunk_0..slab_chunk_{C-1}, x, ax_old, ax_spill, y,
    lc, uc, ax_out, y_out, aty_out]. Column-space vectors are
    (n_cols_pad/128, 128); the x-window read and the A^T y accumulation
    are dynamic SUBLANE-dim slices (Mosaic allows arbitrary row offsets
    there; 1-D dynamic slices would demand 1024-element alignment)."""
    widths = _chunk_widths(W)
    C = len(widths)
    slab_refs = refs[:C]
    (x_ref, axo_ref, axs_ref, y_ref, lc_ref, uc_ref,
     ax_out, y_out, aty_out) = refs[C:]
    g = pl.program_id(0)
    WB = W // 128

    @pl.when(g == 0)
    def _():
        aty_out[...] = jnp.zeros_like(aty_out)

    # per-tile VPU matvec against the tile's x window
    ax_rows = []
    for i in range(_G):
        s128 = starts_ref[g * _G + i]
        xw = x_ref[pl.ds(s128, WB), :]          # (WB, 128)
        prod = None
        wb = 0
        for c, wc in enumerate(widths):
            slab = slab_refs[c][i]              # (128, wc)
            for lb in range(wc // 128):
                term = slab[:, lb * 128:(lb + 1) * 128] * \
                    xw[wb].reshape(1, 128)
                prod = term if prod is None else prod + term
                wb += 1
        ax_rows.append(jnp.sum(prod, axis=1))
    ax_slab = jnp.stack(ax_rows)                # (_G, 128)
    ax_new = ax_slab + axs_ref[...]             # + spill activity
    ax_tilde = 2.0 * ax_new - axo_ref[...]
    sg = sigma_ref[0]
    y = y_ref[...]
    # two-sided dual prox; lc/uc arrive pre-masked (∓1e30 when infinite)
    y_low = y + sg * (lc_ref[...] - ax_tilde)
    y_high = y + sg * (uc_ref[...] - ax_tilde)
    y_new = jnp.where(
        y_low > 0.0, y_low,
        jnp.where(y_high < 0.0, y_high, jnp.zeros_like(y)),
    )
    ax_out[...] = ax_new
    y_out[...] = y_new
    # transpose partials: y_tile^T A_tile accumulated into each tile's
    # x-window; ONE MXU pass (1,128)@(128,wc) per tile per chunk
    # (streaming all wc output columns through the array beats separate
    # 128-wide dots; an r04 A/B of a VPU transpose+sublane-reduce
    # variant measured -12% on the staircase bench), then lane-aligned
    # static slices feed the window accumulator
    for i in range(_G):
        s128 = starts_ref[g * _G + i]
        y_i = y_new[i:i + 1, :]                 # (1, 128) static slice
        wb = 0
        for c, wc in enumerate(widths):
            slab = slab_refs[c][i]
            part = jax.lax.dot_general(
                y_i, slab,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                    # (1, wc)
            for lb in range(wc // 128):
                aty_out[pl.ds(s128 + wb, 1), :] += \
                    part[:, lb * 128:(lb + 1) * 128]
                wb += 1


@partial(jax.jit, static_argnames=("T", "W", "n_cols_pad", "interpret"))
def _row_pass(slabs, starts, sigma, x_pad2, ax_old2, ax_spill2, y2,
              lc2, uc2, *, T, W, n_cols_pad, interpret):
    """T here is the PADDED tile count (multiple of _G)."""
    nbc = n_cols_pad // 128

    # Every spec carries an explicit index map whose components all
    # derive from g: with scalar prefetch present, Mosaic rejects the
    # default constant maps (their i64 constants fail legalization).
    def whole(shape):
        zeros = lambda g, *_: tuple(g * 0 for _ in shape)  # noqa: E731
        return pl.BlockSpec(shape, zeros, memory_space=pltpu.VMEM)

    def rows():
        return pl.BlockSpec((_G, 128), lambda g, *_: (g, g * 0),
                            memory_space=pltpu.VMEM)

    widths = _chunk_widths(W)
    slab_specs = []
    off = 0
    for wc in widths:
        c = off // wc
        slab_specs.append(pl.BlockSpec(
            (_G, 128, wc),
            lambda g, *_, c=c: (g, g * 0, g * 0 + c),
        ))
        off += wc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # starts, sigma
        grid=(T // _G,),
        in_specs=slab_specs + [
            whole((nbc, 128)),   # x
            rows(),              # ax_old
            rows(),              # ax_spill
            rows(),              # y
            rows(),              # lc masked
            rows(),              # uc masked
        ],
        out_specs=[
            rows(),              # ax_new
            rows(),              # y_new
            whole((nbc, 128)),   # aty accumulator
        ],
    )
    kw = {}
    import os as _os
    _vm = _os.environ.get("CUOPT_PDHG_VMEM_MB")
    if _vm:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(_vm) * 1024 * 1024
        )
    if not _os.environ.get("CUOPT_PDHG_NO_COST"):
        kw["cost_estimate"] = pl.CostEstimate(
            flops=4 * T * 128 * W,
            bytes_accessed=T * 128 * W * 4,
            transcendentals=0,
        )
    return pl.pallas_call(
        partial(_kernel, W=W),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, 128), jnp.float32),
            jax.ShapeDtypeStruct((nbc, 128), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )(starts, sigma, *([slabs] * len(widths)),
      x_pad2, ax_old2, ax_spill2, y2, lc2, uc2)


# Above this many padded x-space elements, the resident x/aty VMEM
# blocks of the standard kernel break the Mosaic pipeline (measured
# r04: a 1M-col instance ran at 4 it/s vs the slab stream's potential
# hundreds). Larger instances use the STREAMED variant below: x windows
# arrive as per-tile input blocks (one XLA row-gather per iteration)
# and the transpose partials leave as a streamed output, scattered into
# the aty vector by an XLA row-segment-sum — nothing column-sized stays
# resident in VMEM.
_VMEM_RESIDENT_LIMIT = 1 << 18


def _kernel_stream(starts_ref, sigma_ref, *refs, W):
    """Streamed-partials variant of _kernel (see _VMEM_RESIDENT_LIMIT):
    identical math, but the x window is a streamed input block and the
    per-tile transpose partials are a streamed output instead of an
    in-VMEM aty accumulator."""
    widths = _chunk_widths(W)
    C = len(widths)
    slab_refs = refs[:C]
    (xw_ref, axo_ref, axs_ref, y_ref, lc_ref, uc_ref,
     ax_out, y_out, parts_out) = refs[C:]
    WB = W // 128

    ax_rows = []
    for i in range(_G):
        xw = xw_ref[i]                          # (WB, 128)
        prod = None
        wb = 0
        for c, wc in enumerate(widths):
            slab = slab_refs[c][i]              # (128, wc)
            for lb in range(wc // 128):
                term = slab[:, lb * 128:(lb + 1) * 128] * \
                    xw[wb].reshape(1, 128)
                prod = term if prod is None else prod + term
                wb += 1
        ax_rows.append(jnp.sum(prod, axis=1))
    ax_slab = jnp.stack(ax_rows)                # (_G, 128)
    ax_new = ax_slab + axs_ref[...]
    ax_tilde = 2.0 * ax_new - axo_ref[...]
    sg = sigma_ref[0]
    y = y_ref[...]
    y_low = y + sg * (lc_ref[...] - ax_tilde)
    y_high = y + sg * (uc_ref[...] - ax_tilde)
    y_new = jnp.where(
        y_low > 0.0, y_low,
        jnp.where(y_high < 0.0, y_high, jnp.zeros_like(y)),
    )
    ax_out[...] = ax_new
    y_out[...] = y_new
    for i in range(_G):
        y_i = y_new[i:i + 1, :]
        wb = 0
        for c, wc in enumerate(widths):
            part = jax.lax.dot_general(
                y_i, slab_refs[c][i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                    # (1, wc)
            for lb in range(wc // 128):
                parts_out[i, wb] = part[0, lb * 128:(lb + 1) * 128]
                wb += 1


@partial(jax.jit, static_argnames=("T", "W", "interpret"))
def _row_pass_stream(slabs, starts, sigma, xwin, ax_old2, ax_spill2,
                     y2, lc2, uc2, *, T, W, interpret):
    WB = W // 128
    widths = _chunk_widths(W)

    def rows():
        return pl.BlockSpec((_G, 128), lambda g, *_: (g, g * 0),
                            memory_space=pltpu.VMEM)

    def rows3(d1):
        return pl.BlockSpec((_G, d1, 128),
                            lambda g, *_: (g, g * 0, g * 0),
                            memory_space=pltpu.VMEM)

    slab_specs = []
    off = 0
    for wc in widths:
        c = off // wc
        slab_specs.append(pl.BlockSpec(
            (_G, 128, wc),
            lambda g, *_, c=c: (g, g * 0, g * 0 + c),
        ))
        off += wc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // _G,),
        in_specs=slab_specs + [
            rows3(WB),           # x windows
            rows(),              # ax_old
            rows(),              # ax_spill
            rows(),              # y
            rows(),              # lc masked
            rows(),              # uc masked
        ],
        out_specs=[
            rows(),              # ax_new
            rows(),              # y_new
            rows3(WB),           # transpose partials
        ],
    )
    return pl.pallas_call(
        partial(_kernel_stream, W=W),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, WB, 128), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * T * 128 * W,
            bytes_accessed=2 * T * 128 * W * 4,
            transcendentals=0,
        ),
    )(starts, sigma, *([slabs] * len(widths)),
      xwin, ax_old2, ax_spill2, y2, lc2, uc2)


def fused_row_pass(op, x_new, ax_old, y, lc0m, uc0m, sigma,
                   interpret: bool | None = None):
    """Run the fused Ax -> dual prox -> A^T y pass.

    Args (device f32): op BlockBandOp, x_new (n_cols,), ax_old (n_rows,)
    full activity at the current iterate, y (n_rows,), lc0m/uc0m masked
    constraint bounds (∓1e30 where infinite), sigma scalar.

    Returns (ax_new, y_new, aty_new, interaction_raw, dy_dot) with full
    spill handling (ax spill folded in before the prox; A^T y spill added
    after). interaction_raw = dy·(ax_new - ax_old) (unsigned by caller).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rows, n_cols = op.n_rows, op.n_cols
    T = op.row_slabs.shape[0]
    W = op.w_row
    n_cols_pad = _col_pad(op)

    # Ax spill from x_new (XLA; zero-size skipped at trace time)
    if op.spill_vals.shape[0]:
        ax_spill = jax.ops.segment_sum(
            op.spill_vals * x_new[op.spill_cols], op.spill_rows,
            num_segments=n_rows, indices_are_sorted=True,
        )
    else:
        ax_spill = jnp.zeros((n_rows,), jnp.float32)

    T_pad = -(-T // _G) * _G
    pad_r = T_pad * 128 - n_rows

    def to2(v, fill=0.0):
        return jnp.pad(v, (0, pad_r),
                       constant_values=fill).reshape(T_pad, 128)

    x_pad2 = jnp.pad(x_new, (0, n_cols_pad - n_cols)).reshape(-1, 128)
    slabs = op.row_slabs
    if T_pad != T:
        slabs = jnp.pad(slabs, ((0, T_pad - T), (0, 0), (0, 0)))
    starts = jnp.asarray(
        [s // 128 for s in op.row_starts] + [0] * (T_pad - T), jnp.int32
    )
    sigma_arr = jnp.asarray(sigma, jnp.float32).reshape(1)

    if n_cols_pad > _VMEM_RESIDENT_LIMIT:
        # streamed variant: x windows gathered by 128-wide ROWS of the
        # (nbc, 128) layout (window starts are 128-aligned), partials
        # scattered back the same way
        WB = W // 128
        nbc = n_cols_pad // 128
        starts_np = np.asarray(
            [s // 128 for s in op.row_starts] + [0] * (T_pad - T),
            np.int64,
        )
        rows_idx = (starts_np[:, None]
                    + np.arange(WB)[None, :]).reshape(-1)
        rows_idx_j = jnp.asarray(rows_idx, jnp.int32)
        xwin = x_pad2[rows_idx_j].reshape(T_pad, WB, 128)
        ax2, y2n, parts = _row_pass_stream(
            slabs, starts, sigma_arr, xwin,
            to2(ax_old), to2(ax_spill), to2(y),
            to2(lc0m, -1e30), to2(uc0m, 1e30),
            T=T_pad, W=W, interpret=interpret,
        )
        aty_pad = jax.ops.segment_sum(
            parts.reshape(-1, 128), rows_idx_j, num_segments=nbc,
        )
    else:
        ax2, y2n, aty_pad = _row_pass(
            slabs, starts, sigma_arr, x_pad2,
            to2(ax_old), to2(ax_spill), to2(y),
            to2(lc0m, -1e30), to2(uc0m, 1e30),
            T=T_pad, W=W, n_cols_pad=n_cols_pad, interpret=interpret,
        )
    ax_new = ax2.reshape(-1)[:n_rows]
    y_new = y2n.reshape(-1)[:n_rows]
    aty_new = aty_pad.reshape(-1)[:n_cols]
    # A^T y spill (XLA): the kernel covers (row_slabs)^T y, so the
    # remainder is the transpose of the ROW-side spill — scatter each
    # (v, r, c) entry as aty[c] += v * y_new[r]
    if op.spill_vals.shape[0]:
        aty_new = aty_new + jax.ops.segment_sum(
            op.spill_vals * y_new[op.spill_rows], op.spill_cols,
            num_segments=n_cols,
        )
    # step-size reductions in XLA from the kernel outputs (fused into the
    # surrounding elementwise graph; negligible next to the slab stream)
    dy = y_new - y
    interaction = jnp.dot(dy, ax_new - ax_old)
    dy_dot = jnp.dot(dy, dy)
    return ax_new, y_new, aty_new, interaction, dy_dot
