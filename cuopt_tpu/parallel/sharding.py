"""Multi-chip sharding for the LP solver.

The reference is a single-GPU engine (SURVEY.md section 2.9); multi-chip
scaling is the new TPU-native capability. Design (north star in
BASELINE.json): partition the constraint matrix by ROW blocks across the
mesh. Then, in the PDHG step:

  - A x      : rows sharded, x replicated -> each chip computes its row
               block locally; result y-space vectors stay row-sharded.
  - A^T y    : each chip computes a partial over its rows; XLA/GSPMD
               inserts the psum (reduce over 'rows') producing the
               replicated x-space result.
  - scalars (step size, primal weight, norms) are replicated; the dot
    products and norms over sharded vectors become partial-reduce + psum.

Everything flows from data placement: we commit the arrays with
NamedShardings and jit-compiled GSPMD propagates shardings through the
whole major iteration (fori/while loops included) inserting collectives
over ICI. No explicit collectives are needed in the solver code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuopt_tpu.lp.pdlp import DeviceProblem, SolverState
from cuopt_tpu.sparse.ops import BlockBandOp, CsrOp, DenseOp, EllOp, \
    PermutedOp

ROW_AXIS = "rows"
DCN_AXIS = "slices"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (ROW_AXIS,))


def make_mesh_2d(n_slices: int, n_per_slice: int) -> Mesh:
    """(slices, rows) mesh for multi-slice pods: the LEADING axis models
    DCN (inter-slice) and the trailing axis ICI (intra-slice) — the
    device order follows jax.devices(), which enumerates slice-major on
    real multi-slice topologies, so 'rows' collectives ride ICI and
    'slices' collectives DCN (SURVEY §2.9 north-star axis; the
    single-GPU reference has no distribution at all)."""
    devices = np.array(jax.devices()[: n_slices * n_per_slice])
    return Mesh(devices.reshape(n_slices, n_per_slice),
                (DCN_AXIS, ROW_AXIS))


def hierarchical_psum(x, mesh: Mesh):
    """Global sum of a (slices*rows)-sharded vector decomposed into
    intra-slice (ICI) + inter-slice (DCN) stages: psum over ROW_AXIS
    first — each slice reduces locally over fast ICI — then ONE scalar
    per slice crosses the slow DCN. The decomposition is the building
    block for multi-slice PDLP termination/step reductions (the flat
    psum over both axes would move every partial over DCN)."""
    import jax.numpy as jnp

    def body(xs):
        local = jnp.sum(xs)
        intra = jax.lax.psum(local, ROW_AXIS)   # ICI stage
        return jax.lax.psum(intra, DCN_AXIS)    # DCN stage: 1 scalar

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=P((DCN_AXIS, ROW_AXIS)),
        out_specs=P(),
        check_vma=False,
    )(x)


def _shard_operator(op, mesh: Mesh):
    """Row-partition the operator.

    BlockBandOp (the production path): row slabs partitioned over their
    ROW-tile axis and transpose slabs over their COLUMN-tile axis — each
    chip owns a contiguous band of 128-row tiles and computes its slab
    einsum locally. The operand windows are static slices of the x/y
    vectors; GSPMD turns the cross-chip window reads into the minimal
    collective (halo-sized gathers for in-band windows). The tiny CSR
    spill stays replicated.

    Dense: row blocks. ELL: row-ELL arrays row-sharded; the transpose
    ELL gathers from the row-sharded y, which GSPMD resolves with an
    all-gather."""
    row = NamedSharding(mesh, P(ROW_AXIS))
    row2 = NamedSharding(mesh, P(ROW_AXIS, None))
    row3 = NamedSharding(mesh, P(ROW_AXIS, None, None))
    rep = NamedSharding(mesh, P())
    if isinstance(op, PermutedOp):
        return op.replace(
            inner=_shard_operator(op.inner, mesh),
            row_perm=jax.device_put(op.row_perm, rep),
            inv_row_perm=jax.device_put(op.inv_row_perm, rep),
            col_perm=jax.device_put(op.col_perm, rep),
            inv_col_perm=jax.device_put(op.inv_col_perm, rep),
        )
    if isinstance(op, BlockBandOp):
        op2 = op.replace(
            mesh=mesh,  # batched window reads: O(1) collectives/step
            row_slabs=jax.device_put(op.row_slabs, row3),
            col_slabs=jax.device_put(op.col_slabs, row3),
            spill_vals=jax.device_put(op.spill_vals, rep),
            spill_rows=jax.device_put(op.spill_rows, rep),
            spill_cols=jax.device_put(op.spill_cols, rep),
            t_spill_vals=jax.device_put(op.t_spill_vals, rep),
            t_spill_rows=jax.device_put(op.t_spill_rows, rep),
            t_spill_cols=jax.device_put(op.t_spill_cols, rep),
        )
        # single-exchange fused attempt (halo_attempt): widened row
        # slabs so one neighbor ppermute pair serves the whole PDHG
        # attempt — 5.33 -> ~3 collectives/step in the HLO inventory
        return op2.build_halo_extension()
    if isinstance(op, DenseOp):
        return DenseOp(mat=jax.device_put(op.mat, row2))
    if isinstance(op, EllOp):
        return op.replace(
            row_vals=jax.device_put(op.row_vals, row2),
            row_cols=jax.device_put(op.row_cols, row2),
            col_vals=jax.device_put(op.col_vals, rep),
            col_rows=jax.device_put(op.col_rows, rep),
        )
    if isinstance(op, CsrOp):
        # shard the nnz-dim arrays across the mesh: pad each ordering to
        # a device multiple with harmless zero entries (value 0 pointed
        # at the LAST row/col keeps the segment ids sorted), then let
        # GSPMD partition the gathers/segment-sums and insert the reduce
        import jax.numpy as jnp

        D = mesh.devices.size
        nnz = op.csr_vals.shape[0]
        pad = (-nnz) % D

        def padv(a, fill):
            return jnp.pad(a, (0, pad), constant_values=fill)

        return op.replace(
            csr_vals=jax.device_put(padv(op.csr_vals, 0.0), row),
            csr_rows=jax.device_put(
                padv(op.csr_rows, op.n_rows - 1), row),
            csr_cols=jax.device_put(padv(op.csr_cols, 0), row),
            csc_vals=jax.device_put(padv(op.csc_vals, 0.0), row),
            csc_rows=jax.device_put(padv(op.csc_rows, 0), row),
            csc_cols=jax.device_put(
                padv(op.csc_cols, op.n_cols - 1), row),
        )
    return jax.device_put(op, rep)


def shard_problem_and_state(
    dev: DeviceProblem, state: SolverState, mesh: Mesh
):
    """Commit problem + solver state with the row-partition layout.

    y-space vectors are row-sharded; x-space vectors are ALSO sharded
    when their length divides the mesh (the BlockBandOp halo fast path
    then runs fully distributed with fixed-size neighbor exchanges),
    falling back to replication otherwise."""
    row = NamedSharding(mesh, P(ROW_AXIS))
    rep = NamedSharding(mesh, P())
    D = mesh.devices.size
    col = row if int(dev.c.shape[0]) % D == 0 else rep

    def put_rows(x):
        return jax.device_put(x, row)

    def put_rep(x):
        return jax.device_put(x, rep)

    def put_cols(x):
        return jax.device_put(x, col)

    dev_sharded = dev.replace(
        op=_shard_operator(dev.op, mesh),
        c=put_cols(dev.c), lv=put_cols(dev.lv), uv=put_cols(dev.uv),
        lc=put_rows(dev.lc), uc=put_rows(dev.uc),
        lv_fin=put_cols(dev.lv_fin), uv_fin=put_cols(dev.uv_fin),
        lc_fin=put_rows(dev.lc_fin), uc_fin=put_rows(dev.uc_fin),
        lv0=put_cols(dev.lv0), uv0=put_cols(dev.uv0),
        lc0=put_rows(dev.lc0), uc0=put_rows(dev.uc0),
        c_orig=put_cols(dev.c_orig),
        lv_orig=put_cols(dev.lv_orig), uv_orig=put_cols(dev.uv_orig),
        lc_orig=put_rows(dev.lc_orig), uc_orig=put_rows(dev.uc_orig),
        lv0_orig=put_cols(dev.lv0_orig), uv0_orig=put_cols(dev.uv0_orig),
        lc0_orig=put_rows(dev.lc0_orig), uc0_orig=put_rows(dev.uc0_orig),
        row_scale=put_rows(dev.row_scale),
        col_scale=put_cols(dev.col_scale),
        offset=put_rep(dev.offset),
    )
    state_sharded = state.replace(
        x=put_cols(state.x), y=put_rows(state.y),
        ax=put_rows(state.ax), aty=put_cols(state.aty),
        step_size=put_rep(state.step_size),
        primal_weight=put_rep(state.primal_weight),
        sum_weights=put_rep(state.sum_weights),
        avg_x=put_cols(state.avg_x), avg_y=put_rows(state.avg_y),
        avg_ax=put_rows(state.avg_ax), avg_aty=put_cols(state.avg_aty),
        x_last_restart=put_cols(state.x_last_restart),
        y_last_restart=put_rows(state.y_last_restart),
        last_restart_kkt=put_rep(state.last_restart_kkt),
        last_candidate_kkt=put_rep(state.last_candidate_kkt),
        iters_since_restart=put_rep(state.iters_since_restart),
        total_steps=put_rep(state.total_steps),
        total_attempts=put_rep(state.total_attempts),
        numerical_error=put_rep(state.numerical_error),
    )
    return dev_sharded, state_sharded
