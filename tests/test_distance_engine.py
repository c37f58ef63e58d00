"""Distance engine (waypoint matrix) tests.

Golden values from the reference test suite
(cpp/tests/distance_engine/utilities/data_model.hpp: first/second test
data models), plus a consistency check against a host Dijkstra on the real
waypoint graph dataset (datasets/distance_engine/waypoint_matrix.txt).
"""

import heapq
import pathlib

import numpy as np
import pytest

from cuopt_tpu.distance_engine import WaypointMatrix
from cuopt_tpu.utils.errors import ValidationError

DATA = pathlib.Path("/root/reference/datasets/distance_engine")

# reference first_test_data_model_t
OFFSETS1 = [0, 2, 3, 4, 6, 8, 9, 10]
INDICES1 = [1, 6, 4, 3, 2, 4, 2, 6, 4, 0]
WEIGHTS1 = [2, 10, 3, 2, 2, 5, 1, 1, 2, 10]
CUSTOM1 = [1, 10000000, 10, 1000, 1000, 10000, 100, 100000, 1000000,
           10000000]
TARGETS1 = [0, 3, 6]
LOCATIONS1 = [0, 1, 2]
EXPECTED_COST1 = [[0, 8, 6], [16, 0, 6], [10, 18, 0]]
EXPECTED_CUSTOM1 = [[0, 1111, 100011], [10110000, 0, 110000],
                    [10000000, 10001111, 0]]
EXPECTED_PATH1 = [0, 1, 4, 2, 3, 3, 4, 6]
EXPECTED_SEQ_OFFSETS1 = [0, 5, 8]

# reference second_test_data_model_t
OFFSETS2 = [0, 3, 5, 7, 8, 9]
INDICES2 = [1, 2, 3, 0, 2, 0, 3, 4, 0]
WEIGHTS2 = [1, 2, 3, 4, 5, 6, 7, 8, 9]
TARGETS2 = [0, 1, 2, 4]
LOCATIONS2 = [0, 2, 3, 0, 0, 1, 0]
EXPECTED_COST2 = [
    [0.0, 1.0, 2.0, 11.0],
    [4.0, 0.0, 5.0, 15.0],
    [6.0, 7.0, 0.0, 15.0],
    [9.0, 10.0, 11.0, 0.0],
]
EXPECTED_PATH2 = [0, 2, 2, 3, 4, 4, 0, 0, 0, 1, 1, 0]
EXPECTED_SEQ_OFFSETS2 = [0, 2, 5, 7, 8, 10, 12]


def test_cost_matrix_golden_first():
    wm = WaypointMatrix(OFFSETS1, INDICES1, WEIGHTS1)
    cm = wm.compute_cost_matrix(TARGETS1)
    np.testing.assert_allclose(cm, EXPECTED_COST1)


def test_cost_matrix_golden_second():
    wm = WaypointMatrix(OFFSETS2, INDICES2, WEIGHTS2)
    cm = wm.compute_cost_matrix(TARGETS2)
    np.testing.assert_allclose(cm, EXPECTED_COST2)


def test_waypoint_sequence_golden_first():
    wm = WaypointMatrix(OFFSETS1, INDICES1, WEIGHTS1)
    wm.compute_cost_matrix(TARGETS1)
    seq_offsets, full_path = wm.compute_waypoint_sequence(
        TARGETS1, LOCATIONS1
    )
    np.testing.assert_array_equal(seq_offsets, EXPECTED_SEQ_OFFSETS1)
    np.testing.assert_array_equal(full_path, EXPECTED_PATH1)


def test_waypoint_sequence_golden_second():
    wm = WaypointMatrix(OFFSETS2, INDICES2, WEIGHTS2)
    wm.compute_cost_matrix(TARGETS2)
    seq_offsets, full_path = wm.compute_waypoint_sequence(
        TARGETS2, LOCATIONS2
    )
    np.testing.assert_array_equal(seq_offsets, EXPECTED_SEQ_OFFSETS2)
    np.testing.assert_array_equal(full_path, EXPECTED_PATH2)


def test_custom_weights_golden():
    wm = WaypointMatrix(OFFSETS1, INDICES1, WEIGHTS1)
    cm = wm.compute_shortest_path_costs(TARGETS1, CUSTOM1)
    np.testing.assert_allclose(cm, EXPECTED_CUSTOM1)


def test_sequence_requires_cost_matrix_first():
    wm = WaypointMatrix(OFFSETS1, INDICES1, WEIGHTS1)
    with pytest.raises(ValidationError):
        wm.compute_waypoint_sequence(TARGETS1, LOCATIONS1)


def test_validation_errors():
    with pytest.raises(ValidationError):
        WaypointMatrix([0, 1], [5], [1.0])  # target out of range
    with pytest.raises(ValidationError):
        WaypointMatrix([0, 2], [0], [1.0])  # offsets end != nnz
    with pytest.raises(ValidationError):
        WaypointMatrix([0, 1], [0], [-1.0])  # negative weight
    wm = WaypointMatrix(OFFSETS1, INDICES1, WEIGHTS1)
    with pytest.raises(ValidationError):
        wm.compute_cost_matrix([0, 99])


def _host_dijkstra(offsets, indices, weights, src, n):
    dist = np.full(n, np.inf)
    dist[src] = 0.0
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for e in range(offsets[u], offsets[u + 1]):
            v = indices[e]
            nd = d + weights[e]
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_real_waypoint_graph_matches_dijkstra():
    """Real 1000-vertex graph from the reference datasets; the JAX min-plus
    fixed point must agree with host Dijkstra."""
    lines = (DATA / "waypoint_matrix.txt").read_text().strip().splitlines()
    offsets = np.array(
        [int(x) for x in lines[0].strip().rstrip(",").split(",")], np.int64
    )
    indices = np.array(
        [int(x) for x in lines[1].strip().rstrip(",").split(",")], np.int64
    )
    weights = np.array(
        [float(x) for x in lines[2].strip().rstrip(",").split(",")],
        np.float64,
    )
    targets = [int(x) for x in (DATA / "target_locations_id.txt")
               .read_text().strip().rstrip(",").split(",")][:12]
    n = len(offsets) - 1
    wm = WaypointMatrix(offsets, indices, weights)
    cm = wm.compute_cost_matrix(targets)
    for i, s in enumerate(targets):
        ref = _host_dijkstra(offsets, indices, weights, s, n)
        np.testing.assert_allclose(cm[i], ref[targets], rtol=1e-5)
