"""cuopt_tpu — a TPU-native mathematical-optimization engine.

A from-scratch JAX/XLA/Pallas implementation of the capability set of NVIDIA
cuOpt (reference: /root/reference): LP via restarted PDHG (PDLP), MILP via
branch-and-bound + primal heuristics, and VRP/TSP/PDP routing via guided
ejection search + parallel local search.

The compute path is JAX (jit / pallas / lax.while_loop / vmap over a
jax.sharding.Mesh); sequential latency-bound algorithms (dual simplex, B&B
drivers, MPS parsing fast-path) are host C++ bound via ctypes.
"""

import os as _os

from jax import config as _jax_config

# Double precision is required for PDLP termination parity with the reference
# (cuOpt runs PDLP in fp64; see reference cpp/src/linear_programming/pdlp.cu).
# f32 compute paths are still available per-solve via settings.dtype.
_jax_config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: solver major-iteration programs are
# compiled once per (shape, settings) and reused across processes. On
# hosts where XLA compilation is remote (high latency), this is the
# difference between instant and ~15s solver startup.
if _os.environ.get("CUOPT_TPU_DISABLE_COMPILE_CACHE") != "1":
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/cuopt_tpu_jax_cache"
    )
    _jax_config.update("jax_compilation_cache_dir", _cache_dir)
    _jax_config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _jax_config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

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
