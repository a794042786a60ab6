"""Shared QUBO formulations (`solvers/formulations.py`) vs the objective
oracles — license-free coverage of the exact-solver formulation layer
(reference: `gurobi.py:301-413` QUBO switch, `config.py:82`)."""

import numpy as np
import pytest

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.problems.objectives import obj_maxcut
from rlsolver_tpu.solvers.formulations import (
    qubo_graph_partitioning,
    qubo_maxcut,
    qubo_mis,
    qubo_mvc,
    qubo_number_partitioning,
    qubo_value,
)

G = graph_from_name("BA_20_ID0")
RNG = np.random.default_rng(0)


def random_bits(n=20, k=40):
    return RNG.integers(0, 2, size=(k, n)).astype(float)


def test_qubo_maxcut_matches_objective():
    q, const = qubo_maxcut(G)
    for x in random_bits():
        assert qubo_value(x, q, const) == pytest.approx(obj_maxcut(x.astype(bool), G))


def test_qubo_mis_counts_and_penalizes():
    q, const = qubo_mis(G, penalty=2.0)
    n0, n1, _ = G.edge_arrays()
    for x in random_bits():
        viol = sum(x[i] * x[j] for i, j in zip(n0, n1))
        assert qubo_value(x, q, const) == pytest.approx(x.sum() - 2.0 * viol)
    # the empty set scores 0; any single node scores 1
    assert qubo_value(np.zeros(20), q, const) == 0
    one = np.zeros(20)
    one[3] = 1
    assert qubo_value(one, q, const) == 1


def test_qubo_mvc_covers_and_penalizes():
    q, const = qubo_mvc(G, penalty=2.0)
    n0, n1, _ = G.edge_arrays()
    for x in random_bits():
        uncovered = sum((1 - x[i]) * (1 - x[j]) for i, j in zip(n0, n1))
        assert qubo_value(x, q, const) == pytest.approx(-x.sum() - 2.0 * uncovered)
    # full cover: value = -n exactly
    assert qubo_value(np.ones(20), q, const) == pytest.approx(-20.0)


def test_qubo_partitioning_balanced_equals_negative_cut():
    q, const = qubo_graph_partitioning(G)
    pen = float(G.weighted_degrees().max()) + 1.0
    for x in random_bits():
        cut = obj_maxcut(x.astype(bool), G)
        imbalance = (x.sum() - 10.0) ** 2
        assert qubo_value(x, q, const) == pytest.approx(-cut - pen * imbalance)


def test_qubo_number_partitioning():
    w = RNG.uniform(1, 10, 12)
    q, const = qubo_number_partitioning(w)
    for x in RNG.integers(0, 2, size=(30, 12)).astype(float):
        diff = (w * (2 * x - 1)).sum()
        assert qubo_value(x, q, const) == pytest.approx(-(diff ** 2))


def test_gurobi_adapter_dispatch_is_gated():
    from rlsolver_tpu.solvers import gurobi

    # unknown problem raises before the license gate
    with pytest.raises(ValueError):
        gurobi.solve_problem_qubo("tsp", G)
    if gurobi.HAS_GUROBI:  # pragma: no cover - no license in CI
        r = gurobi.solve_problem_qubo("maxcut", G, time_limit=5)
        assert r.obj <= r.bound + 1e-6
    else:
        with pytest.raises(ImportError):
            gurobi.solve_problem_qubo("maxcut", G)


def test_milp_builders_shared_with_scip_adapter():
    """The gated SCIP adapter consumes the same MilpFormulation objects the
    HiGHS path solves (round-1 weak item: formulation code must be shared
    and therefore tested)."""
    import numpy as np
    import pytest

    from rlsolver_tpu.core.generate import graph_from_name
    from rlsolver_tpu.core.io import KnapsackInstance, SetCoverInstance
    from rlsolver_tpu.solvers import milp, scip

    g = graph_from_name("BA_24_ID0")
    sc = SetCoverInstance(4, ((1, 2), (2, 3), (3, 4), (1, 4)))
    kp = KnapsackInstance(
        instance_id=0, capacity=6.0,
        weights=np.array([2.0, 3.0, 4.0]), profits=np.array([3.0, 4.0, 5.0]),
    )
    fs = [
        milp.build_maxcut(g), milp.build_mis(g), milp.build_mvc(g),
        milp.build_graph_partitioning(g), milp.build_set_cover(sc),
        milp.build_knapsack(kp),
    ]
    for f in fs:
        assert f.a.shape == (f.lo.shape[0], f.num_vars)
        assert f.hi.shape == f.lo.shape
        assert np.all(f.lo <= f.hi)
        # HiGHS solves the exact same object
        res = milp._solve_formulation(f, time_limit=20.0)
        assert np.isfinite(res.obj)
    if not scip.HAS_SCIP:
        with pytest.raises(ImportError, match="pyscipopt"):
            scip.solve_formulation(fs[0])
