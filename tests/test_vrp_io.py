"""Solomon / CVRPLIB instance IO + BKS table parsing
(reference: l2_routing_test.cu:33-53 reads these formats via its dataset
helpers; datasets/ref/*.txt hold the instance lists + BKS values)."""

import os
import textwrap

import numpy as np
import pytest

from cuopt_tpu.io.vrp import (
    load_bks_table,
    parse_cvrplib,
    parse_solomon,
    solution_cost,
    synth_gh_instance,
    write_solomon,
)

SOLOMON = textwrap.dedent("""\
    TEST1

    VEHICLE
    NUMBER     CAPACITY
      3         200

    CUSTOMER
    CUST NO.  XCOORD.   YCOORD.    DEMAND   READY TIME  DUE DATE   SERVICE TIME
        0      40         50          0          0       1236          0
        1      45         68         10          0        967         90
        2      45         70         30        825        870         90
        3      42         66         10         65        146         90
""")

CVRP = textwrap.dedent("""\
    NAME : X-n5-k2
    TYPE : CVRP
    DIMENSION : 5
    EDGE_WEIGHT_TYPE : EUC_2D
    CAPACITY : 50
    NODE_COORD_SECTION
    1 0 0
    2 10 0
    3 0 10
    4 10 10
    5 5 5
    DEMAND_SECTION
    1 0
    2 20
    3 20
    4 20
    5 20
    DEPOT_SECTION
    1
    -1
    EOF
""")


def test_parse_solomon():
    inst = parse_solomon(SOLOMON)
    assert inst.name == "TEST1"
    assert inst.n_customers == 3
    assert inst.n_vehicles == 3
    assert inst.capacity == 200
    assert inst.tw_late[0] == 1236
    assert inst.demand[2] == 30
    assert inst.edge_weights == "exact"


def test_solomon_roundtrip():
    inst = parse_solomon(SOLOMON)
    inst2 = parse_solomon(write_solomon(inst))
    np.testing.assert_allclose(inst2.xy, inst.xy)
    np.testing.assert_allclose(inst2.tw_late, inst.tw_late)
    assert inst2.capacity == inst.capacity


def test_parse_cvrplib():
    inst = parse_cvrplib(CVRP)
    assert inst.n_customers == 4
    assert inst.n_vehicles == 2
    assert inst.capacity == 50
    assert inst.edge_weights == "round"
    d = inst.cost_matrix()
    assert d[0, 1] == 10  # rounded euclidean
    assert d[0, 4] == round((50**0.5))


def test_bks_tables_parse():
    ref = "/root/reference/datasets/ref"
    if not os.path.isdir(ref):
        pytest.skip("reference datasets not mounted")
    t = load_bks_table(os.path.join(ref, "bks_gehring_homberger.csv"))
    assert t["C1_2_1.TXT"] == (20, 2704.57)
    t2 = load_bks_table(os.path.join(ref, "homberger.txt"))
    assert t2["C1_2_1.TXT"] == (20, 2704.57)
    t3 = load_bks_table(os.path.join(ref, "cvrp.txt"))
    assert t3["X-n536-k96.vrp"] == (96, 94846)


def test_solve_small_solomon():
    inst = parse_solomon(SOLOMON)
    from cuopt_tpu.routing.settings import SolverSettings
    from cuopt_tpu.routing.solver import Solve

    dm = inst.to_data_model()
    s = SolverSettings()
    s.time_limit = 5
    sol = Solve(dm, s)
    assert sol.status == 0, sol.message
    cost, used = solution_cost(inst, sol)
    assert cost > 0 and used >= 1
    # all three customers with their TWs are servable by one vehicle:
    # depot->3 (wait to 65)->1->2 fits every window
    assert used <= 2


def test_synth_gh_shapes():
    inst = synth_gh_instance(100, "RC", seed=3)
    assert inst.n_customers == 100
    assert inst.tw_early.shape == (101,)
    assert (inst.tw_late[1:] >= inst.tw_early[1:]).all()
    dm = inst.to_data_model()
    dm.validate()
