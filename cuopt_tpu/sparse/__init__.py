from cuopt_tpu.sparse.ops import (
    CsrOp,
    DenseOp,
    EllOp,
    LinearOperator,
    BlockBandOp,
    PermutedOp,
    build_block_band,
    build_permuted_band,
    build_operator,
)

__all__ = ["LinearOperator", "DenseOp", "EllOp", "CsrOp",
           "BlockBandOp", "PermutedOp", "build_block_band",
           "build_permuted_band", "build_operator"]
