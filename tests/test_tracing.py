"""Tracing + debug-assert infrastructure (reference NVTX ranges +
cuopt_assert/ASSERT_MODE, SURVEY.md §5; macros.cuh:17-31)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_named_scopes_appear_in_hlo():
    import jax
    import jax.numpy as jnp

    from cuopt_tpu.lp.hyper_params import PRESETS
    from cuopt_tpu.lp.pdlp import (
        StaticCfg,
        build_device_problem,
        initial_state,
    )
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.problem.synthetic import generate_lp
    import cuopt_tpu.lp.pdlp as P

    settings = PDLPSolverSettings()
    hp = PRESETS[settings.pdlp_solver_mode]
    t = settings.tolerances
    cfg = StaticCfg(
        hp=hp, abs_primal=t.absolute_primal_tolerance,
        rel_primal=t.relative_primal_tolerance,
        abs_dual=t.absolute_dual_tolerance,
        rel_dual=t.relative_dual_tolerance,
        abs_gap=t.absolute_gap_tolerance,
        rel_gap=t.relative_gap_tolerance,
    )
    prob = generate_lp(64, 64, 4, seed=1)
    dev = build_device_problem(prob, hp, jnp.float64, "ell")
    state = initial_state(dev, hp, jnp.float64)
    fn = P.make_major_fn(cfg)
    txt = jax.jit(getattr(fn, "__wrapped__", fn)).lower(
        dev, state
    ).as_text(debug_info=True)
    assert "pdlp_pdhg_steps" in txt
    assert "pdlp_termination" in txt


def test_debug_assert_fires_under_env():
    code = """
import os
os.environ["CUOPT_DEBUG_ASSERTS"] = "1"
import jax, jax.numpy as jnp
from cuopt_tpu.utils.tracing import debug_assert

@jax.jit
def f(x):
    debug_assert(jnp.all(x > 0), "positive input required")
    return x * 2

print(float(f(jnp.asarray(1.0))[()] if hasattr(f(jnp.asarray(1.0)), '__getitem__') else f(jnp.asarray(1.0))))
try:
    r = f(jnp.asarray(-1.0))
    jax.block_until_ready(r)
    import numpy as np
    np.asarray(r)
    print("NO_RAISE")
except Exception:
    print("RAISED_OK")
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert "RAISED_OK" in r.stdout, (r.stdout, r.stderr[-1500:])


def test_debug_assert_noop_by_default():
    import jax.numpy as jnp

    from cuopt_tpu.utils.tracing import debug_assert

    # no env -> no-op even for a False predicate
    debug_assert(jnp.asarray(False), "must not fire")
