"""Host dual simplex (C++), mirroring reference cpp/src/dual_simplex/.

The native library is built from cpp/dual_simplex; until it is compiled
and loadable, `is_available()` returns False and the concurrent LP method
degrades to PDLP-only.
"""

from __future__ import annotations


def is_available() -> bool:
    try:
        from cuopt_tpu.dual_simplex.bindings import load_library

        return load_library() is not None
    except Exception:
        return False


def solve_with_dual_simplex(prob, settings, timer):
    from cuopt_tpu.dual_simplex.bindings import solve_lp_simplex

    return solve_lp_simplex(prob, settings, timer)


def run_concurrent_lp(prob, settings, timer):
    from cuopt_tpu.dual_simplex.concurrent import run_concurrent

    return run_concurrent(prob, settings, timer)
