"""Weak-scaling harness for the sharded PDLP (BASELINE.json north star:
>=80% weak-scaling efficiency at 2+ hosts).

Runs the full PDLP major iteration on a banded LP whose ROW COUNT grows
proportionally with the device count (constant work per device) and
reports iterations/s and efficiency vs the 1-device run.

On real multi-chip TPU hardware run it as-is (devices = jax.devices()).
Without hardware, `--virtual N` simulates N host CPU devices — useful to
validate the sharding/collective structure, not to measure bandwidth.

Usage:
    python scripts/weak_scaling.py [--virtual 8] [--rows-per-dev 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N CPU devices (validation only)")
    ap.add_argument("--rows-per-dev", type=int, default=8192)
    ap.add_argument("--band", type=int, default=256)
    ap.add_argument("--majors", type=int, default=10)
    ap.add_argument("--out", default=None,
                    help="write a JSON artifact with the full table")
    args = ap.parse_args()

    if args.virtual and os.environ.get("_WEAK_SCALING_CHILD") != "1":
        # jax may already be initialized by the interpreter's
        # sitecustomize; re-exec with the CPU-mesh env to get a clean
        # N-device backend
        env = dict(os.environ)
        env["_WEAK_SCALING_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{args.virtual} --xla_cpu_multi_thread_eigen=false"
        ).strip()
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    import jax
    import jax.numpy as jnp

    from cuopt_tpu.lp.hyper_params import PRESETS
    from cuopt_tpu.lp.pdlp import (
        StaticCfg,
        build_device_problem,
        initial_state,
        make_major_fn,
    )
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.parallel import make_mesh, shard_problem_and_state
    from cuopt_tpu.problem.synthetic import generate_lp

    n_avail = len(jax.devices())
    settings = PDLPSolverSettings()
    hp = PRESETS[settings.pdlp_solver_mode]
    t = settings.tolerances
    cfg = StaticCfg(
        hp=hp,
        abs_primal=t.absolute_primal_tolerance,
        rel_primal=t.relative_primal_tolerance,
        abs_dual=t.absolute_dual_tolerance,
        rel_dual=t.relative_dual_tolerance,
        abs_gap=t.absolute_gap_tolerance,
        rel_gap=t.relative_gap_tolerance,
        # the fused Pallas pass is single-chip; the sharded program uses
        # the GSPMD einsum path with XLA-inserted collectives
        fused_kernel="off",
    )
    fn = make_major_fn(cfg)

    results = {}
    n_dev = 1
    counts = []
    while n_dev <= n_avail:
        counts.append(n_dev)
        n_dev *= 2
    table = []
    for nd in counts:
        n_rows = args.rows_per_dev * nd
        prob = generate_lp(n_rows, n_rows, 8, seed=123, band=args.band)
        dev = build_device_problem(prob, hp, jnp.float32, "blockband")
        state = initial_state(dev, hp, jnp.float32)
        mesh = make_mesh(nd)
        dev, state = shard_problem_and_state(dev, state, mesh)
        state, report = fn(dev, state)  # compile + warm
        jax.block_until_ready(report["total_steps"])
        start = int(report["total_steps"])
        t0 = time.perf_counter()
        for _ in range(args.majors):
            state, report = fn(dev, state)
        jax.block_until_ready(report["total_steps"])
        dt = time.perf_counter() - t0
        iters = int(report["total_steps"]) - start
        results[nd] = iters / dt
        eff = results[nd] / results[counts[0]]
        row = {
            "devices": nd, "rows": n_rows,
            "iters_per_s": round(results[nd], 2),
            "weak_scaling_efficiency": round(eff, 4),
        }
        table.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        art = {
            "virtual_cpu_mesh": bool(args.virtual),
            "rows_per_device": args.rows_per_dev,
            "table": table,
        }
        try:
            art["hlo_analysis"] = analyze_hlo(
                min(8, n_avail), args.rows_per_dev, args.band
            )
        except Exception as exc:  # noqa: BLE001
            art["hlo_analysis_error"] = str(exc)
        json.dump(art, open(args.out, "w"), indent=1)
    return 0




def analyze_hlo(n_dev=8, rows_per_dev=4096, band=256):
    """Structural analysis of the sharded program: inventory the
    collectives GSPMD inserted into one major iteration and model the
    per-step communication volume vs local slab traffic. On a virtual
    CPU mesh the WALL CLOCK is meaningless (devices share host cores),
    but the compiled HLO is the SAME program structure a real TPU slice
    executes, so comm/compute byte ratios transfer."""
    import re

    import jax
    import jax.numpy as jnp

    from cuopt_tpu.lp.hyper_params import PRESETS
    from cuopt_tpu.lp.pdlp import (
        build_device_problem,
        initial_state,
        make_major_fn,
    )
    from cuopt_tpu.lp.settings import PDLPSolverSettings
    from cuopt_tpu.parallel import make_mesh, shard_problem_and_state
    from cuopt_tpu.problem.synthetic import generate_lp

    settings = PDLPSolverSettings()
    hp = PRESETS[settings.pdlp_solver_mode]
    t = settings.tolerances
    from cuopt_tpu.lp.pdlp import StaticCfg

    cfg = StaticCfg(
        hp=hp,
        abs_primal=t.absolute_primal_tolerance,
        rel_primal=t.relative_primal_tolerance,
        abs_dual=t.absolute_dual_tolerance,
        rel_dual=t.relative_dual_tolerance,
        abs_gap=t.absolute_gap_tolerance,
        rel_gap=t.relative_gap_tolerance,
        fused_kernel="off",
    )
    n_rows = rows_per_dev * n_dev
    prob = generate_lp(n_rows, n_rows, 8, seed=123, band=band)
    dev = build_device_problem(prob, hp, jnp.float32, "blockband")
    state = initial_state(dev, hp, jnp.float32)
    mesh = make_mesh(n_dev)
    dev_s, state_s = shard_problem_and_state(dev, state, mesh)
    fn = make_major_fn(cfg)
    txt = jax.jit(getattr(fn, "__wrapped__", fn)).lower(
        dev_s, state_s
    ).compile().as_text()

    # Attribute collectives to HLO computations: ops inside the while-
    # loop bodies execute once PER STEP; entry-level ops amortize over
    # the whole major. Count op starts only (async start/done pairs
    # must not double-count).
    op_re = re.compile(
        r"= *\(?(f32|f64|s32|u32|pred|bf16)\[([\d,]*)\][^\n]*?\s"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
        r"(-start|-done)?\(", )
    comps = re.split(r"\n(?=%?[\w\.\-]+ \(|ENTRY )", txt)
    colls = {}
    byte_total = 0
    body_colls = {}
    body_bytes = 0
    for comp in comps:
        c_ops = {}
        c_bytes = 0
        for m in op_re.finditer(comp):
            if m.group(4) == "-done":
                continue  # async pair: count the -start only
            kind = m.group(3)
            n_el = 1
            for d in m.group(2).split(","):
                if d:
                    n_el *= int(d)
            colls[kind] = colls.get(kind, 0) + 1
            nb = n_el * (8 if m.group(1) == "f64" else 4)
            byte_total += nb
            c_ops[kind] = c_ops.get(kind, 0) + 1
            c_bytes += nb
        header = comp.split("(", 1)[0]
        if "region" in header and c_ops:
            # a while/fori body: executes once per step (or attempt)
            for k, v in c_ops.items():
                body_colls[k] = body_colls.get(k, 0) + v
            body_bytes += c_bytes

    majors = hp.major_iteration
    slab_bytes = int(dev.op.row_slabs.size + dev.op.col_slabs.size) * 4
    per_dev_slab = slab_bytes // n_dev
    n_coll_total = sum(colls.values())
    n_body = sum(body_colls.values())
    # The take_step attempt body appears TWICE in the HLO (the loop-init
    # attempt inlined in the steps-loop body + the retry while body),
    # but per executed step only `attempts_per_step` of those run —
    # Malitsky-Pock accepts the first attempt on almost every step.
    # Measure the real rate from a short sharded run.
    st2, _ = fn(dev_s, state_s)
    jax.block_until_ready(st2)
    steps2 = max(int(st2.total_steps) - int(state_s.total_steps), 1)
    att2 = max(int(st2.total_attempts) - int(state_s.total_attempts),
               steps2)
    attempts_per_step = att2 / steps2
    per_site = n_body / 2
    coll_per_step = per_site * attempts_per_step + \
        (n_coll_total - n_body) / max(majors, 1)
    comm_per_step = (body_bytes / 2) * attempts_per_step + \
        (byte_total - body_bytes) / max(majors, 1)
    # v5e-class: HBM ~819e9 B/s per chip, ICI ~4.5e10 B/s per direction.
    # Comm time = bandwidth term + LATENCY term (the r03 model ignored
    # latency and was refuted by its own permute counts). Hop counts by
    # collective kind: a halo ppermute is ONE neighbor hop; ring
    # all-gather/all-reduce cost ~(D-1) hops.
    hop_latency_s = 1e-6
    hops = 0.0
    for k, v in body_colls.items():
        hops += v * (1 if k == "collective-permute" else (n_dev - 1))
    hops += (n_coll_total - n_body) * (n_dev - 1) / max(majors, 1)
    hbm_t = per_dev_slab / 819e9
    ici_bw_t = comm_per_step / 4.5e10
    ici_lat_t = hops * hop_latency_s
    predicted_eff = hbm_t / (hbm_t + ici_bw_t + ici_lat_t)
    # the same structure at production scale (per-device rows grow;
    # comm bytes/latency per step are size-independent for the gathered
    # window form, so efficiency climbs with per-device work)
    scale_curve = {}
    for mult in (1, 2, 4, 16, 64):
        h = hbm_t * mult
        b = ici_bw_t * mult  # all-gather bytes grow with vector size
        scale_curve[f"{rows_per_dev * mult}_rows_per_dev"] = round(
            h / (h + b + ici_lat_t), 4
        )
    return {
        "devices": n_dev,
        "collective_ops_in_program": colls,
        "collectives_per_step_est": round(coll_per_step, 2),
        "comm_bytes_per_major": int(byte_total),
        "comm_bytes_per_step_est": int(comm_per_step),
        "local_slab_bytes_per_step_per_dev": int(per_dev_slab),
        "ici_latency_s_per_step_est": round(ici_lat_t, 9),
        "predicted_weak_scaling_efficiency_v5e": round(predicted_eff, 4),
        "predicted_efficiency_vs_rows_per_dev": scale_curve,
        "note": "virtual CPU mesh wall-clock is NOT a bandwidth "
                "measurement; this models the compiled HLO's collective "
                "count (x ring latency) AND byte volume against v5e "
                "HBM/ICI rates",
    }


if __name__ == "__main__":
    sys.exit(main())
