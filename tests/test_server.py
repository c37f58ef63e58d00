"""Server integration tests.

Mirrors the reference server test strategy (python/cuopt_server tests: a
pytest fixture spawns a real server process and drives HTTP —
tests/utils/utils.py:306-321): LP + routing solves, aborts/unknown ids,
payload encodings, health.
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
import time

import pytest
import requests

LP_PAYLOAD = {
    "csr_constraint_matrix": {
        "offsets": [0, 2, 4], "indices": [0, 1, 0, 1],
        "values": [3.0, 4.0, 2.7, 10.1],
    },
    "objective_data": {"coefficients": [-0.2, -0.1], "offset": 0.0},
    "constraint_bounds": {
        "upper_bounds": [5.4, 4.9], "lower_bounds": ["ninf", "ninf"],
    },
    "variable_bounds": {
        "lower_bounds": [0.0, 0.0], "upper_bounds": ["inf", "inf"],
    },
    "maximize": False,
    "solver_config": {"method": 1},
}

ROUTING_PAYLOAD = {
    "cost_matrix_data": {
        "data": {"0": [[0, 1, 5, 2], [2, 0, 7, 4],
                       [1, 5, 0, 9], [5, 6, 2, 0]]}
    },
    "fleet_data": {"vehicle_locations": [[0, 0], [0, 0]]},
    "task_data": {"task_locations": [1, 2, 3]},
    "solver_config": {"time_limit": 2},
}


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "cuopt_tpu.server", "--port", str(port),
         "-d", "1"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    base = f"http://127.0.0.1:{port}"
    for _ in range(120):
        try:
            if requests.get(base + "/cuopt/health", timeout=1).ok:
                break
        except requests.ConnectionError:
            time.sleep(0.5)
    else:
        proc.kill()
        pytest.fail("server did not start")
    yield base
    proc.terminate()
    try:
        proc.wait(timeout=5)
    except subprocess.TimeoutExpired:
        proc.kill()


def _poll(base, req_id, timeout=240):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        r = requests.get(f"{base}/cuopt/solution/{req_id}")
        if r.status_code == 200:
            return r.json()
        assert r.status_code == 202, r.text
        time.sleep(0.3)
    pytest.fail("poll timeout")


def test_health(server):
    r = requests.get(server + "/cuopt/health")
    assert r.ok and r.json()["status"] == "RUNNING"
    assert requests.get(server + "/v2/health/ready").ok
    assert requests.get(server + "/v2/health/live").ok


def test_lp_async_roundtrip(server):
    r = requests.post(server + "/cuopt/request", json=LP_PAYLOAD)
    assert r.ok, r.text
    req_id = r.json()["reqId"]
    res = _poll(server, req_id)
    sol = res["response"]["solver_response"]["solution"]
    assert sol["termination_reason"] == "Optimal"
    assert abs(sol["primal_objective"] - (-0.36)) < 1e-3


def test_routing_roundtrip(server):
    r = requests.post(server + "/cuopt/request", json=ROUTING_PAYLOAD)
    assert r.ok, r.text
    res = _poll(server, r.json()["reqId"])
    out = res["response"]["solver_response"]
    assert out["num_vehicles"] >= 1
    assert out["solution_cost"] > 0


def test_unknown_request(server):
    assert requests.get(
        server + "/cuopt/solution/nonexistent"
    ).status_code == 404


def test_malformed_payload_rejected(server):
    r = requests.post(
        server + "/cuopt/request",
        json={"csr_constraint_matrix": {"bogus": 1}},
    )
    assert r.status_code == 422


def test_pickle_rejected(server):
    r = requests.post(
        server + "/cuopt/request", data=b"x",
        headers={"Content-Type": "application/pickle"},
    )
    assert r.status_code == 415


def test_msgpack_zlib(server):
    import zlib

    import msgpack

    data = zlib.compress(msgpack.packb(LP_PAYLOAD))
    r = requests.post(
        server + "/cuopt/request", data=data,
        headers={"Content-Type": "application/vnd.msgpack+zlib"},
    )
    assert r.ok, r.text
    res = _poll(server, r.json()["reqId"])
    assert res["response"]["solver_response"]["solution"][
        "termination_reason"
    ] == "Optimal"


def test_abort(server):
    r = requests.post(server + "/cuopt/request", json=ROUTING_PAYLOAD)
    req_id = r.json()["reqId"]
    requests.delete(f"{server}/cuopt/request/{req_id}")
    out = requests.get(f"{server}/cuopt/solution/{req_id}")
    assert out.status_code in (410, 202, 200)


def test_thin_client(server):
    from cuopt_tpu.clients import (
        CuOptServiceSelfHostClient,
        ThinClientSolverSettings,
    )

    host, port = server.replace("http://", "").split(":")
    c = CuOptServiceSelfHostClient(
        ip=host, port=int(port), polling_interval=0.3
    )
    s = ThinClientSolverSettings()
    s.set_parameter("method", 1)
    res = c.get_LP_solve(LP_PAYLOAD, s)
    assert res["response"]["solver_response"]["solution"][
        "termination_reason"
    ] == "Optimal"


def test_warmstart_endpoint(server):
    """GET /cuopt/solution/{id}/warmstart returns reusable PDLP state
    (reference webserver.py:835); resubmitting with warm_start_data
    succeeds."""
    base = server
    payload = dict(LP_PAYLOAD)
    payload["solver_config"] = {"method": 1}  # PDLP path has warm start
    r = requests.post(f"{base}/cuopt/request", json=payload)
    req_id = r.json()["reqId"]
    deadline = time.time() + 120
    while time.time() < deadline:
        rr = requests.get(f"{base}/cuopt/solution/{req_id}")
        if rr.status_code == 200:
            break
        time.sleep(0.3)
    ws = requests.get(f"{base}/cuopt/solution/{req_id}/warmstart")
    assert ws.status_code == 200
    data = ws.json()["warmstart"]
    assert "current_primal_solution" in data
    # resubmit with the warm start payload
    payload2 = dict(payload)
    payload2["warm_start_data"] = data
    r2 = requests.post(f"{base}/cuopt/request", json=payload2)
    assert r2.status_code == 200
    req2 = r2.json()["reqId"]
    deadline = time.time() + 120
    while time.time() < deadline:
        rr = requests.get(f"{base}/cuopt/solution/{req2}")
        if rr.status_code == 200:
            break
        time.sleep(0.3)
    assert rr.status_code == 200


def test_mip_incumbents_streamed(server):
    """MIP solves stream incumbents (reference /incumbents endpoint +
    send_solution callback, utils/solver.py:337)."""
    base = server
    payload = {
        "csr_constraint_matrix": {
            "offsets": [0, 2], "indices": [0, 1], "values": [1.0, 1.0],
        },
        "objective_data": {"coefficients": [-1.0, -1.0], "offset": 0.0},
        "constraint_bounds": {
            "upper_bounds": [7.0], "lower_bounds": ["ninf"],
        },
        "variable_bounds": {
            "lower_bounds": [0.0, 0.0], "upper_bounds": [5.0, 5.0],
        },
        "variable_types": ["I", "I"],
        "solver_config": {"time_limit": 60},
    }
    r = requests.post(f"{base}/cuopt/request", json=payload)
    req_id = r.json()["reqId"]
    deadline = time.time() + 180
    while time.time() < deadline:
        rr = requests.get(f"{base}/cuopt/solution/{req_id}")
        if rr.status_code == 200:
            break
        time.sleep(0.3)
    assert rr.status_code == 200
    inc = requests.get(
        f"{base}/cuopt/solution/{req_id}/incumbents"
    ).json()["incumbents"]
    assert len(inc) >= 1
    assert "solution" in inc[0] and "cost" in inc[0]


def test_malformed_payloads_rejected_strictly():
    """Semantic validation depth (reference utils/*/data_definition.py
    strict models): shape/sense/time-window violations must be rejected
    at the schema layer, not crash the solver."""
    import pydantic
    import pytest as _pytest

    from cuopt_tpu.server.data_definition import (
        FleetData,
        LPData,
        TaskData,
        VehicleBreak,
    )

    # CSR offsets not monotone
    with _pytest.raises(pydantic.ValidationError):
        LPData(csr_constraint_matrix={
            "offsets": [0, 2, 1], "indices": [0, 1], "values": [1, 1],
        })
    # nnz mismatch
    with _pytest.raises(pydantic.ValidationError):
        LPData(csr_constraint_matrix={
            "offsets": [0, 3], "indices": [0, 1], "values": [1, 1],
        })
    # column index out of range vs objective length
    with _pytest.raises(pydantic.ValidationError):
        LPData(
            csr_constraint_matrix={
                "offsets": [0, 1], "indices": [5], "values": [1.0],
            },
            objective_data={"coefficients": [1.0, 2.0]},
        )
    # bad constraint sense
    with _pytest.raises(pydantic.ValidationError):
        LPData(
            csr_constraint_matrix={
                "offsets": [0, 1], "indices": [0], "values": [1.0],
            },
            objective_data={"coefficients": [1.0]},
            constraint_bounds={"bounds": [1.0], "types": ["X"]},
        )
    # unknown field (extra=forbid)
    with _pytest.raises(pydantic.ValidationError):
        LPData(not_a_field=1)
    # fleet: reversed vehicle TW
    with _pytest.raises(pydantic.ValidationError):
        FleetData(vehicle_locations=[[0, 0]],
                  vehicle_time_windows=[[10, 5]])
    # fleet: capacity row wrong width
    with _pytest.raises(pydantic.ValidationError):
        FleetData(vehicle_locations=[[0, 0], [0, 0]],
                  capacities=[[5]])
    # tasks: PD pair out of range
    with _pytest.raises(pydantic.ValidationError):
        TaskData(task_locations=[1, 2],
                 pickup_and_delivery_pairs=[[0, 7]])
    # break: latest < earliest
    with _pytest.raises(pydantic.ValidationError):
        VehicleBreak(vehicle_id=0, earliest=10, latest=5, duration=1)


def test_result_store_billing_version(server):
    """Server aux parity (reference billing_data.py, result_store.py,
    mock_store.py:21, job_queue.py:104): billing endpoint, version gate,
    shared-memory large payloads, store abstraction."""
    import json
    import urllib.request

    base = server

    # incompatible client version -> 426
    lp = {"csr_constraint_matrix": {"offsets": [0, 1], "indices": [0],
                                    "values": [1.0]},
          "objective_data": {"coefficients": [1.0]},
          "constraint_bounds": {"bounds": [1.0], "types": ["L"]},
          "variable_bounds": {"lower_bounds": [0.0],
                              "upper_bounds": [10.0]}}
    req = urllib.request.Request(
        base + "/cuopt/request", data=json.dumps(lp).encode(),
        headers={"Content-Type": "application/json",
                 "CLIENT-VERSION": "99.99"},
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("version gate did not fire")
    except urllib.error.HTTPError as e:
        assert e.code == 426

    # large payload rides shared memory transparently: ~1MB of bounds
    # crosses CUOPT_SHM_THRESHOLD (job_queue.py SHM path)
    n = 80_000
    big = {
        "csr_constraint_matrix": {"offsets": [0] + [1] * n,
                                  "indices": [0], "values": [1.0]},
        "objective_data": {"coefficients": [1.0] * 1},
        "constraint_bounds": {"bounds": [1.0] * n, "types": ["L"] * n},
        "variable_bounds": {"lower_bounds": [0.0],
                            "upper_bounds": [10.0]},
    }
    req = urllib.request.Request(
        base + "/cuopt/request", data=json.dumps(big).encode(),
        headers={"Content-Type": "application/json"},
    )
    rid = json.load(urllib.request.urlopen(req))["reqId"]
    import time as _t
    for _ in range(120):
        r = json.load(urllib.request.urlopen(
            base + f"/cuopt/solution/{rid}"
        ))
        if "response" in r or r.get("status") == "error":
            break
        _t.sleep(0.5)
    assert "response" in r, r  # solved through the SHM path

    # billing summary reflects the requests
    b = json.load(urllib.request.urlopen(base + "/cuopt/billing"))
    assert b["total_requests"] >= 1
    assert b["completed"] >= 1
    assert b["billed_seconds"] >= 0.0

    # store abstraction: MockStore records operations
    from cuopt_tpu.server.result_store import MockStore

    ms = MockStore()
    ms.put("a", {"status": "done"})
    assert ms.get("a")["status"] == "done"
    ms.delete("a")
    assert ms.get("a") is None
    assert ("put", "a") in ms.ops and ("delete", "a") in ms.ops
