from cuopt_tpu.clients.self_hosted import (
    CuOptServiceSelfHostClient,
    ThinClientSolverSettings,
)

__all__ = ["CuOptServiceSelfHostClient", "ThinClientSolverSettings"]
