from cuopt_tpu.sparse.ops import (
    CsrOp,
    DenseOp,
    EllOp,
    LinearOperator,
    build_operator,
)

__all__ = ["LinearOperator", "DenseOp", "EllOp", "CsrOp", "build_operator"]
