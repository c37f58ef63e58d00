"""Tracing/profiling hooks — the NVTX-range analogue.

The reference scatters raft::common::nvtx::range through solver hot
paths (mip/solve.cu:60, pdlp.cu, routing GES/LS kernels) and relies on
Nsight for timelines. TPU equivalents wired here:

  - trace_scope(name): jax.named_scope inside traced code (names appear
    in XLA HLO and in profiler timelines) + jax.profiler.TraceAnnotation
    for host-side spans.
  - CUOPT_PROFILE_DIR=<dir>: when set, the first solve starts a
    jax.profiler trace into <dir> and atexit stops it (open with
    TensorBoard / xprof).

Debug asserts — the cuopt_assert / ASSERT_MODE analogue
(cpp/src/utilities/macros.cuh:17-31): debug_assert() compiles device
checks via jax.experimental.checkify when CUOPT_DEBUG_ASSERTS=1 and is
a no-op otherwise (zero cost in production programs).
"""

from __future__ import annotations

import atexit
import contextlib
import os

import jax

_profile_started = False


def asserts_enabled() -> bool:
    return os.environ.get("CUOPT_DEBUG_ASSERTS", "0") == "1"


def maybe_start_profile() -> None:
    """Idempmotent: start a jax.profiler trace when CUOPT_PROFILE_DIR is
    set (called at the top of every solve entry)."""
    global _profile_started
    d = os.environ.get("CUOPT_PROFILE_DIR")
    if not d or _profile_started:
        return
    jax.profiler.start_trace(d)
    _profile_started = True
    atexit.register(_stop_profile)


def _stop_profile() -> None:
    global _profile_started
    if _profile_started:
        try:
            jax.profiler.stop_trace()
        finally:
            _profile_started = False


@contextlib.contextmanager
def trace_scope(name: str):
    """Named scope usable both inside jitted code (names the HLO ops)
    and on host (profiler span)."""
    with jax.named_scope(name):
        with jax.profiler.TraceAnnotation(name):
            yield


def debug_assert(pred, msg: str) -> None:
    """Device-side invariant check, active only under
    CUOPT_DEBUG_ASSERTS=1 (reference cuopt_assert, macros.cuh:17).

    Uses jax.debug.check-free formulation: under asserts, a debug
    callback prints and raises on host when the predicate is False.
    `pred` is a scalar boolean (traced or concrete)."""
    if not asserts_enabled():
        return
    import jax.numpy as jnp

    def _cb(ok):
        if not bool(ok):
            raise AssertionError(f"cuopt_tpu debug_assert failed: {msg}")

    jax.debug.callback(_cb, jnp.asarray(pred))
