"""HTTP solver service (aiohttp).

Endpoint parity with the reference FastAPI server
(python/cuopt_server/cuopt_server/webserver.py):

  GET  /cuopt/health                      :152
  GET  /v2/health/ready, /v2/health/live  :158-164
  POST /cuopt/request                     :874  (async submit -> reqId)
  GET  /cuopt/solution/{id}               :805  (poll result)
  GET  /cuopt/solution/{id}/incumbents    :368
  GET  /cuopt/log/{id}                    :314
  DELETE /cuopt/log/{id}                  :422
  DELETE /cuopt/request/{id}              :594  (abort)
  DELETE /cuopt/solution/{id}             :635
  POST /cuopt/solution                    :467  (sync-style solve)

Payloads: JSON, msgpack and zlib-compressed JSON via Content-Type
(reference accepts msgpack/zlib/pickle; pickle is intentionally NOT
supported here — the reference needs a SafeUnpickler to restrict it,
job_queue.py:138-173; we simply reject it).

The FastAPI dependency is absent in this environment, so the server is
built on aiohttp with the same routes and pydantic validation.
"""

from __future__ import annotations

import asyncio
import json
import zlib

import msgpack
from aiohttp import web
from pydantic import ValidationError as PydanticValidationError

from cuopt_tpu.server.job_queue import JobQueue


def _decode_body(raw: bytes, content_type: str) -> dict:
    if "zlib" in content_type or raw[:2] == b"\x78\x9c":
        raw = zlib.decompress(raw)
    if "msgpack" in content_type:
        return msgpack.unpackb(raw, raw=False)
    if "pickle" in content_type:
        raise web.HTTPUnsupportedMediaType(
            text="pickle payloads are not supported"
        )
    return json.loads(raw)


def _job_kind(payload: dict) -> str:
    if "csr_constraint_matrix" in payload:
        return "lp"
    if "task_data" in payload or "fleet_data" in payload:
        return "routing"
    raise web.HTTPUnprocessableEntity(
        text="payload is neither an LP nor a routing problem"
    )


def _validate(payload: dict, kind: str):
    from cuopt_tpu.server.data_definition import (
        LPData,
        OptimizedRoutingData,
    )

    try:
        if kind == "lp":
            LPData(**payload)
        else:
            OptimizedRoutingData(**payload)
    except PydanticValidationError as exc:
        raise web.HTTPUnprocessableEntity(
            text=json.dumps({"error": str(exc)})
        )


def make_app(n_workers: int | None = None) -> web.Application:
    app = web.Application(client_max_size=1024 * 1024 * 1024)
    jq = JobQueue(n_workers)
    jq.start()
    app["job_queue"] = jq

    async def billing(request):
        return web.json_response(jq.billing.summary())

    async def health(request):
        return web.json_response({"status": "RUNNING", "version": "0.1.0"})

    async def ready(request):
        return web.Response(status=200)

    async def live(request):
        return web.Response(status=200)

    async def submit(request):
        # client-version gate (reference job_queue.py:104)
        from cuopt_tpu.server.result_store import check_client_version

        ok, msg = check_client_version(
            request.headers.get("CLIENT-VERSION")
        )
        if not ok:
            return web.json_response({"error": msg}, status=426)
        raw = await request.read()
        payload = _decode_body(raw, request.content_type or "")
        kind = _job_kind(payload)
        _validate(payload, kind)
        req_id = jq.submit(kind, payload)
        return web.json_response({"reqId": req_id})

    async def poll(request):
        req_id = request.match_info["req_id"]
        res = jq.get_result(req_id)
        if res is None:
            return web.json_response(
                {"error": f"unknown request {req_id}"}, status=404
            )
        if res["status"] in ("queued", "running"):
            return web.json_response({"reqId": req_id}, status=202)
        if res["status"] == "error":
            return web.json_response(
                {"error": res["error"]}, status=500
            )
        if res["status"] == "aborted":
            return web.json_response(
                {"error": "request aborted"}, status=410
            )
        return web.json_response({"response": {"solver_response":
                                               res["result"]}})

    async def sync_solve(request):
        raw = await request.read()
        payload = _decode_body(raw, request.content_type or "")
        kind = _job_kind(payload)
        _validate(payload, kind)
        req_id = jq.submit(kind, payload)
        while True:
            res = jq.get_result(req_id)
            if res and res["status"] in ("done", "error", "aborted"):
                break
            await asyncio.sleep(0.05)
        if res["status"] == "error":
            return web.json_response({"error": res["error"]}, status=500)
        return web.json_response({"response": {"solver_response":
                                               res["result"]}})

    async def abort(request):
        req_id = request.match_info["req_id"]
        ok = jq.abort(req_id)
        return web.json_response({"aborted": ok})

    async def incumbents(request):
        req_id = request.match_info["req_id"]
        return web.json_response(
            {"incumbents": jq.get_incumbents(req_id)}
        )

    async def warmstart(request):
        # reference webserver.py:835 (PDLP warm-start retrieval)
        req_id = request.match_info["req_id"]
        res = jq.store.get(req_id)
        if res is None:
            return web.json_response(
                {"error": f"unknown request {req_id}"}, status=404
            )
        if res.get("status") != "done":
            return web.json_response({"reqId": req_id}, status=202)
        ws = res.get("warmstart")
        if ws is None:
            return web.json_response(
                {"error": "no warm start data for this solve"},
                status=404,
            )
        return web.json_response({"warmstart": ws})

    async def get_log(request):
        req_id = request.match_info["req_id"]
        return web.json_response({"log": jq.get_log(req_id)})

    async def delete_log(request):
        jq.delete_log(request.match_info["req_id"])
        return web.Response(status=204)

    async def delete_solution(request):
        req_id = request.match_info["req_id"]
        jq.store.pop(req_id, None)
        return web.json_response({"deleted": req_id})

    app.router.add_get("/cuopt/health", health)
    app.router.add_get("/cuopt/billing", billing)
    app.router.add_get("/v2/health/ready", ready)
    app.router.add_get("/v2/health/live", live)
    app.router.add_post("/cuopt/request", submit)
    app.router.add_get("/cuopt/solution/{req_id}", poll)
    app.router.add_post("/cuopt/solution", sync_solve)
    app.router.add_delete("/cuopt/request/{req_id}", abort)
    app.router.add_delete("/cuopt/solution/{req_id}", delete_solution)
    app.router.add_get("/cuopt/solution/{req_id}/incumbents", incumbents)
    app.router.add_get("/cuopt/solution/{req_id}/warmstart", warmstart)
    app.router.add_get("/cuopt/log/{req_id}", get_log)
    app.router.add_delete("/cuopt/log/{req_id}", delete_log)
    # legacy managed-service endpoint (webserver.py:1224)
    app.router.add_post("/cuopt/cuopt", sync_solve)
    return app


def run(host="0.0.0.0", port=5000, n_workers=None):
    app = make_app(n_workers)
    web.run_app(app, host=host, port=port, print=None)
