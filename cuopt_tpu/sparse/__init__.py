from cuopt_tpu.sparse.ops import (
    CsrOp,
    DenseOp,
    EllOp,
    LinearOperator,
    BlockBandOp,
    build_block_band,
    build_operator,
)

__all__ = ["LinearOperator", "DenseOp", "EllOp", "CsrOp",
           "BlockBandOp", "build_block_band", "build_operator"]
