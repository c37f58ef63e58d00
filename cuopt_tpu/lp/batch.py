"""Batch LP solve.

Reference: cython_solve.cu `call_batch_solve` :264 — one CUDA stream +
handle per LP, OpenMP over problems with a memory-capped thread count.
TPU design: same-shape problems are stacked and solved by ONE vmapped PDLP
kernel (the natural TPU analogue of streams — a single fused program over a
batch axis); mixed shapes fall back to sequential solves (each already
jit-cached by shape).
"""

from __future__ import annotations

from cuopt_tpu.lp.pdlp import PdlpSolver
from cuopt_tpu.lp.solution import Solution
from cuopt_tpu.lp.solve import solve_lp


def batch_solve(probs, settings) -> list[Solution]:
    # TODO(vmap): stack same-shaped problems into one vmapped solve once
    # the vmapped kernel lands; sequential is correct and jit-cached.
    return [solve_lp(p, settings) for p in probs]
