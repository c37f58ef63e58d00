"""cuopt_tpu — a TPU-native mathematical-optimization engine.

A from-scratch JAX/XLA/Pallas implementation of the capability set of NVIDIA
cuOpt (reference: /root/reference): LP via restarted PDHG (PDLP), MILP via
branch-and-bound + primal heuristics, and VRP/TSP/PDP routing via guided
ejection search + parallel local search.

The compute path is JAX (jit / pallas / lax.while_loop / vmap over a
jax.sharding.Mesh); sequential latency-bound algorithms (dual simplex, B&B
drivers, MPS parsing fast-path) are host C++ bound via ctypes.
"""

from jax import config as _jax_config

# Double precision is required for PDLP termination parity with the reference
# (cuOpt runs PDLP in fp64; see reference cpp/src/linear_programming/pdlp.cu).
# f32 compute paths are still available per-solve via settings.dtype.
_jax_config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from cuopt_tpu.utils.errors import (  # noqa: E402
    CuOptTpuError,
    InputValidationError,
    MpsParseError,
    OutOfMemoryError,
    RuntimeError_,
    ValidationError,
)

__all__ = [
    "CuOptTpuError",
    "InputValidationError",
    "MpsParseError",
    "ValidationError",
    "OutOfMemoryError",
    "RuntimeError_",
    "__version__",
]
