"""Error types, mirroring the reference error taxonomy.

Reference: cpp/include/cuopt/error.hpp (error_type_t: Success, ValidationError,
OutOfMemoryError, RuntimeError).
"""


class CuOptTpuError(Exception):
    """Base class for all cuopt_tpu errors."""


class ValidationError(CuOptTpuError):
    """Invalid input from the user (bad sizes, bounds, NaNs...)."""


class InputValidationError(ValidationError):
    """Alias kept for API parity with the Python reference package."""


class MpsParseError(ValidationError):
    """Malformed MPS file."""


class OutOfMemoryError(CuOptTpuError):
    """Device or host allocation failure."""


class RuntimeError_(CuOptTpuError):
    """Internal failure during solve."""
