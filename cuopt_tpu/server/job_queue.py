"""Multiprocessing job queue + result store.

Mirrors reference python/cuopt_server/cuopt_server/job_queue.py (jobs/
results/abort multiprocessing queues, result cache, AbortList :299-337)
and process_handler.py (one solver Process per device, watch_solvers
respawn :107). Device count from CUOPT_TPU_COUNT / CUOPT_GPU_COUNT env
(reference cuopt_service.py:134-141) or jax.device_count of the worker.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import pickle
import queue as queue_mod
import threading
import time
import uuid

from cuopt_tpu.server.result_store import (
    BillingData,
    MemoryResultStore,
)

# payloads above this stash in multiprocessing.shared_memory instead of
# riding the pickle through the job queue (reference webserver.py:9 +
# job_queue.py:225-240 SharedMemory path for large models)
SHM_THRESHOLD = int(os.environ.get("CUOPT_SHM_THRESHOLD", 1 << 19))


class JobQueue:
    def __init__(self, n_workers: int | None = None):
        ctx = mp.get_context("spawn")
        self.ctx = ctx
        if n_workers is None:
            n_workers = int(
                os.environ.get(
                    "CUOPT_TPU_COUNT",
                    os.environ.get("CUOPT_GPU_COUNT", "1"),
                )
            )
        self.n_workers = max(1, n_workers)
        self.jobs = ctx.Queue()
        self.results = ctx.Queue()
        self.manager = ctx.Manager()
        self.abort_list = self.manager.list()
        self.store = MemoryResultStore()
        self.billing = BillingData()
        self.incumbents: dict[str, list] = {}
        self.logs: dict[str, list] = {}
        self.procs: list = []
        self._collector = None
        self._watchdog = None
        self._shutdown = threading.Event()

    # -------------------------------------------------------------- jobs
    def submit(self, kind: str, payload: dict) -> str:
        req_id = uuid.uuid4().hex
        self.store.put(req_id, {"status": "queued"})
        blob = pickle.dumps(payload)
        self.billing.start_event(req_id, kind, len(blob))
        if len(blob) >= SHM_THRESHOLD:
            from multiprocessing import shared_memory

            shm = shared_memory.SharedMemory(create=True, size=len(blob))
            shm.buf[: len(blob)] = blob
            name, size = shm.name, len(blob)
            shm.close()
            self.jobs.put((req_id, kind, ("shm", name, size)))
        else:
            self.jobs.put((req_id, kind, payload))
        return req_id

    def abort(self, req_id: str) -> bool:
        entry = self.store.get(req_id)
        if entry is not None and entry.get("status") in (
            "queued", "running",
        ):
            self.abort_list.append(req_id)
            self.store.put(req_id, {"status": "aborted"})
            self.billing.end_event(req_id, "aborted")
            return True
        return False

    def get_result(self, req_id: str):
        return self.store.get(req_id)

    def get_incumbents(self, req_id: str):
        return self.incumbents.get(req_id, [])

    def get_log(self, req_id: str):
        return self.logs.get(req_id, [])

    def delete_log(self, req_id: str):
        self.logs.pop(req_id, None)

    # ----------------------------------------------------------- workers
    def start(self):
        from cuopt_tpu.server.worker import worker_main

        for i in range(self.n_workers):
            p = self.ctx.Process(
                target=worker_main,
                args=(i, self.jobs, self.results, self.abort_list),
                daemon=True,
            )
            p.start()
            self.procs.append(p)
        self._collector = threading.Thread(
            target=self._collect, daemon=True
        )
        self._collector.start()
        self._watchdog = threading.Thread(
            target=self._watch_solvers, daemon=True
        )
        self._watchdog.start()

    def _collect(self):
        while not self._shutdown.is_set():
            try:
                msg = self.results.get(timeout=0.25)
            except queue_mod.Empty:
                continue
            req_id = msg["req_id"]
            if msg["type"] == "result":
                if (self.store.get(req_id) or {}).get("status") != \
                        "aborted":
                    res = msg["result"]
                    ws = res.pop("warmstart", None) \
                        if isinstance(res, dict) else None
                    self.store.put(req_id, {
                        "status": "done", "result": res,
                        "warmstart": ws,
                    })
                    self.billing.end_event(req_id, "done")
            elif msg["type"] == "error":
                self.store.put(req_id, {
                    "status": "error", "error": msg["error"],
                })
                self.billing.end_event(req_id, "error")
            elif msg["type"] == "running":
                if (self.store.get(req_id) or {}).get("status") == \
                        "queued":
                    self.store.put(req_id, {"status": "running"})
            elif msg["type"] == "incumbent":
                self.incumbents.setdefault(req_id, []).append(
                    msg["incumbent"]
                )
            elif msg["type"] == "log":
                self.logs.setdefault(req_id, []).append(msg["line"])

    def _watch_solvers(self):
        """Respawn dead solver processes (reference process_handler.py
        watch_solvers :107)."""
        from cuopt_tpu.server.worker import worker_main

        while not self._shutdown.is_set():
            for i, p in enumerate(self.procs):
                if not p.is_alive():
                    np_ = self.ctx.Process(
                        target=worker_main,
                        args=(i, self.jobs, self.results,
                              self.abort_list),
                        daemon=True,
                    )
                    np_.start()
                    self.procs[i] = np_
            time.sleep(1.0)

    def shutdown(self):
        self._shutdown.set()
        for p in self.procs:
            p.terminate()
