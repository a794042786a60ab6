"""End-to-end over every data format the reference ships.

Each file under /root/reference/rlsolver/data exercises one reader + one
solver chain. berlin52 (TSPLIB) has a known optimum of 7542, giving a real
solution-quality anchor. Skipped when the reference tree is absent.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

DATA = "/root/reference/rlsolver/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data not mounted"
)


def test_knapsack_file_chain():
    from rlsolver_tpu.core.io import read_knapsack
    from rlsolver_tpu.classical.knapsack import dp_knapsack, greedy_knapsack

    inst = read_knapsack(os.path.join(DATA, "knapsack", "knap_40_9550.txt"))
    assert inst.num_items == 40
    bits_dp, v_dp = dp_knapsack(inst)
    bits_g, v_g = greedy_knapsack(inst)
    w = np.asarray(inst.weights)
    assert w[bits_dp].sum() <= inst.capacity + 1e-9
    assert v_dp >= v_g - 1e-9  # exact >= heuristic


def test_multiknapsack_files_solve_to_stated_optima():
    from rlsolver_tpu.core.io import read_multiknapsack
    from rlsolver_tpu.solvers.milp import solve_multiknapsack

    for fname in ("mknap1_ID00.txt", "mknap2_ID02.txt"):  # both layouts
        inst = read_multiknapsack(os.path.join(DATA, "multiknapsack", fname))
        res = solve_multiknapsack(inst, time_limit=30)
        assert (inst.constraints @ res.solution <= inst.rhs + 1e-6).all()
        assert abs(res.obj - inst.optimal_obj) < 1e-6  # header states optimum


def test_maxsat_cnf_chain():
    from rlsolver_tpu.problems.maxsat import MaxSatEnv, MaxSatInstance

    inst = MaxSatInstance.from_cnf(os.path.join(DATA, "maxsat", "randu0.cnf"))
    assert inst.num_vars == 14 and inst.num_clauses == 14
    env = MaxSatEnv(inst)
    bits = env.random_bits(jax.random.PRNGKey(0), 64)
    out = env.sweep(jax.random.PRNGKey(1), bits, num_sweeps=3, noise=0.0)
    best = float(env.obj(out).max())
    # all clauses are unit clauses in this instance: satisfiable
    assert best == inst.num_clauses


def test_qubo_file_chain():
    from rlsolver_tpu.problems.qubo import QuboEnv, read_qubo

    q = read_qubo(os.path.join(DATA, "qubo", "nbiq_5.txt"))
    assert q.shape[0] == q.shape[1]
    env = QuboEnv(q)
    spins = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(0), 0.5, (32, env.num_vars)), 1.0, -1.0
    )
    out = env.sweep_pm(spins, num_sweeps=3)
    assert float(env.obj_pm(out).max()) >= float(env.obj_pm(spins).max())


def test_solomon_c101_chain():
    from rlsolver_tpu.solvers.vrptw import VrptwInstance, solve_vrptw, route_feasible

    inst = VrptwInstance.from_solomon(
        os.path.join(DATA, "solomon-instances", "c101.txt"), num_customers=8
    )
    assert inst.num_customers == 8
    res = solve_vrptw(inst, max_iters=10)
    covered = sorted(c for r in res.selected for c in r)
    assert set(covered) >= set(range(1, 9))
    for r in res.selected:
        assert route_feasible(inst, r)


def test_berlin52_local_search_quality():
    from rlsolver_tpu.core.io import read_tsp_coords, tsp_distance_matrix
    from rlsolver_tpu.classical.tsp import (
        nearest_neighbor_tour,
        or_opt_moves,
        two_opt_best_improvement,
    )

    coords = read_tsp_coords(os.path.join(DATA, "tsplib", "berlin52.tsp"))
    assert coords.shape == (52, 2)
    dist = tsp_distance_matrix(coords)
    dj = jnp.asarray(dist)
    tours = jnp.asarray(
        np.stack([nearest_neighbor_tour(dist, start=s) for s in range(8)])
    )
    tours, _ = two_opt_best_improvement(tours, dj, max_iters=200)
    tours, _ = or_opt_moves(jax.random.PRNGKey(0), tours, dj, num_iters=300)
    tours, lengths = two_opt_best_improvement(tours, dj, max_iters=200)
    best = float(np.asarray(lengths).min())
    # known optimum 7542; NN + 2-opt/or-opt from 8 starts lands within 8%
    assert 7542.0 * 0.999 <= best <= 7542.0 * 1.08


def test_syn_ba_seeding_contract():
    """The seeded-name contract: same name -> same graph, with the shipped
    instance's exact size. (Bit-parity with the shipped FILE is impossible:
    it was written under an older networkx whose BA sampler draws
    differently — SURVEY.md section 7.3's parity caveat.)"""
    from rlsolver_tpu.core.generate import graph_from_name
    from rlsolver_tpu.core.io import read_graph

    shipped = read_graph(os.path.join(DATA, "syn_BA", "BA_100_ID0.txt"))
    ours = graph_from_name("BA_100_ID0")
    again = graph_from_name("BA_100_ID0")
    assert shipped.num_nodes == ours.num_nodes
    assert shipped.num_edges == ours.num_edges  # BA(m=4) edge count is fixed
    np.testing.assert_array_equal(ours.edges, again.edges)  # deterministic
