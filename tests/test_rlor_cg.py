"""RLOR column generation: cutting stock and VRPTW."""

import numpy as np

from rlsolver_tpu.solvers.column_generation import (
    CuttingStockInstance,
    best_reduced_cost,
    bounded_knapsack_pricing,
    first_fit_decreasing,
    solve_cutting_stock,
)
from rlsolver_tpu.solvers.vrptw import (
    VrptwInstance,
    esspprc_pricing,
    route_cost,
    route_feasible,
    solve_vrptw,
)


def test_bounded_knapsack_pricing():
    sizes = np.asarray([30.0, 40.0, 50.0])
    duals = np.asarray([0.4, 0.55, 0.9])
    max_per = np.asarray([3, 2, 2])
    a, v = bounded_knapsack_pricing(sizes, 100.0, duals, max_per)
    assert (a * sizes).sum() <= 100.0
    assert abs(v - (a * duals).sum()) < 1e-5
    # optimal here: 2 x 50 -> 1.8 (beats 50+40 = 1.45 and 3x30 = 1.2)
    assert abs(v - 1.8) < 1e-6


def test_cutting_stock_cg():
    inst = CuttingStockInstance.random(8, roll_width=100.0, seed=3)
    res = solve_cutting_stock(inst)
    # LP history is monotone non-increasing
    assert all(
        res.history[i + 1] <= res.history[i] + 1e-6
        for i in range(len(res.history) - 1)
    )
    # integer solution covers demand and respects roll width
    covered = res.columns.T @ res.int_counts if res.columns.ndim == 2 else None
    a_mat = np.stack(list(res.columns), axis=1)
    covered = a_mat @ res.int_counts
    assert (covered >= inst.demands).all()
    assert ((a_mat.T * inst.sizes).sum(axis=1) <= inst.roll_width + 1e-9).all()
    # CG bound chain: lp <= int <= FFD
    ffd = first_fit_decreasing(inst)
    assert res.lp_value <= res.int_value + 1e-6
    assert res.int_value <= ffd + 1e-6


def test_cutting_stock_policy_hook():
    inst = CuttingStockInstance.random(6, seed=4)
    calls = []

    def greedy_policy(duals, candidates):
        calls.append(len(candidates))
        return best_reduced_cost(duals, candidates)

    res = solve_cutting_stock(inst, policy=greedy_policy, num_candidates=3)
    # pool holds the exact pricing column plus distinct negative-reduced-cost
    # alternatives (when they exist)
    assert calls and all(1 <= c <= 3 for c in calls)
    assert any(c > 1 for c in calls)
    assert res.int_value >= res.lp_value - 1e-6


def test_vrptw_pricing_feasibility():
    inst = VrptwInstance.random(8, seed=1)
    duals = np.concatenate([[0.0], np.full(8, 30.0)])  # big duals: many cols
    routes = esspprc_pricing(inst, duals)
    assert routes  # with large duals there must be improving routes
    for r, rc in routes[:10]:
        assert route_feasible(inst, r)
        expect = route_cost(inst, r) - sum(duals[c] for c in r)
        assert abs(rc - expect) < 1e-6


def test_vrptw_cg_end_to_end():
    inst = VrptwInstance.random(8, seed=2)
    res = solve_vrptw(inst, max_iters=20)
    # all customers covered exactly by the selected routes
    covered = sorted(c for r in res.selected for c in r)
    assert set(covered) >= set(range(1, 9))
    for r in res.selected:
        assert route_feasible(inst, r)
    assert res.lp_value <= res.int_value + 1e-6
    # CG improved on the trivial one-customer-per-route solution
    trivial = sum(route_cost(inst, [c]) for c in range(1, 9))
    assert res.int_value <= trivial + 1e-6


def test_solomon_parser(tmp_path):
    txt = """TEST1

VEHICLE
NUMBER     CAPACITY
  25         200

CUSTOMER
CUST NO.  XCOORD.   YCOORD.   DEMAND    READY TIME  DUE DATE   SERVICE TIME

    0      40        50          0          0       1236          0
    1      45        68         10          0       1127         90
    2      45        70         30          0       1125         90
"""
    p = tmp_path / "solomon.txt"
    p.write_text(txt)
    inst = VrptwInstance.from_solomon(str(p))
    assert inst.num_customers == 2
    assert inst.capacity == 200.0
    np.testing.assert_allclose(inst.coords[0], [40, 50])
    np.testing.assert_allclose(inst.demand, [0, 10, 30])
    np.testing.assert_allclose(inst.service, [0, 90, 90])
