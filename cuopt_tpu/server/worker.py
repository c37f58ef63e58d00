"""Solver worker process.

Mirrors reference process_handler.py (create_process :83-104) + the
per-job flow in utils/solver.py (process_async_solve :332 with
device health check :386 and incumbent streaming :337).
"""

from __future__ import annotations

import queue as queue_mod
import traceback


def _device_health_check() -> bool:
    """Reference cuda_health_check: verify the device still answers."""
    try:
        import jax
        import jax.numpy as jnp

        jax.block_until_ready(jnp.zeros((8,)) + 1.0)
        return True
    except Exception:
        return False


def worker_main(worker_id, jobs, results, abort_list):
    _device_health_check()
    while True:
        try:
            req_id, kind, payload = jobs.get(timeout=0.5)
        except queue_mod.Empty:
            continue
        if isinstance(payload, tuple) and len(payload) == 3 and \
                payload[0] == "shm":
            # large payload stashed in shared memory (reference
            # job_queue.py:225-240): read + unlink
            import pickle
            from multiprocessing import shared_memory

            _, name, size = payload
            shm = shared_memory.SharedMemory(name=name)
            try:
                payload = pickle.loads(bytes(shm.buf[:size]))
            finally:
                shm.close()
                shm.unlink()
        if req_id in abort_list:
            continue
        results.put({"type": "running", "req_id": req_id})
        try:
            if not _device_health_check():
                raise RuntimeError("device health check failed")
            if kind == "lp":
                from cuopt_tpu.server.solver import solve_lp_payload

                def incumbent_cb(solution, cost, _rid=req_id):
                    results.put({
                        "type": "incumbent", "req_id": _rid,
                        "incumbent": {"solution": solution, "cost": cost},
                    })

                result = solve_lp_payload(payload, incumbent_cb)
            elif kind == "routing":
                from cuopt_tpu.server.solver import solve_routing_payload

                result = solve_routing_payload(payload)
            else:
                raise ValueError(f"unknown job kind {kind!r}")
            results.put({
                "type": "result", "req_id": req_id, "result": result,
            })
        except Exception as exc:
            results.put({
                "type": "error", "req_id": req_id,
                "error": f"{type(exc).__name__}: {exc}",
            })
            results.put({
                "type": "log", "req_id": req_id,
                "line": traceback.format_exc(),
            })
