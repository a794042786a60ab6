"""Classical baselines + device objectives + exact MILP cross-validation.

The MILP solver (HiGHS) provides true optima on small instances; greedy/SA/
GA/SDP must be feasible and within range, and device objectives must match
host golden functions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.classical.genetic import GAConfig, genetic_maxcut
from rlsolver_tpu.classical.greedy import (
    greedy_graph_partitioning,
    greedy_maxcut,
    greedy_mis,
    greedy_mvc,
    greedy_set_cover,
)
from rlsolver_tpu.classical.random_walk import random_walk_maxcut
from rlsolver_tpu.classical.sdp import SDPConfig, sdp_maxcut
from rlsolver_tpu.classical.simulated_annealing import (
    SAConfig,
    anneal_bitvector,
    anneal_maxcut,
)
from rlsolver_tpu.core.io import KnapsackInstance, SetCoverInstance
from rlsolver_tpu.ops import objectives as dobj
from rlsolver_tpu.problems import objectives as hobj
from rlsolver_tpu.solvers import milp


# ----------------------------------------------------------- device vs host
def test_device_objectives_match_host(small_graphs):
    g = small_graphs["ER_24"]
    e = dobj.EdgeArrays.build(g)
    key = jax.random.PRNGKey(0)
    xs = jax.random.bernoulli(key, 0.5, (16, g.num_nodes))
    xs_np = np.asarray(xs).astype(int)
    checks = [
        (dobj.obj_maxcut(xs, e), lambda x: hobj.obj_maxcut(x, g)),
        (
            dobj.obj_graph_partitioning(xs, e, g.num_nodes),
            lambda x: hobj.obj_graph_partitioning(x, g),
        ),
        (dobj.obj_minimum_vertex_cover(xs, e), lambda x: hobj.obj_minimum_vertex_cover(x, g)),
        (
            dobj.obj_maximum_independent_set(xs, e),
            lambda x: hobj.obj_maximum_independent_set(x, g),
        ),
    ]
    for got, ref in checks:
        got = np.asarray(got)
        for b in range(xs.shape[0]):
            want = ref(xs_np[b])
            if np.isinf(want):
                assert np.isinf(got[b]) and got[b] < 0
            else:
                assert got[b] == pytest.approx(want)


def test_device_setcover_knapsack_numpart():
    inst = SetCoverInstance(4, ((1, 2), (2, 3), (3, 4), (1, 2, 3, 4)))
    member = jnp.asarray(inst.membership_matrix())
    xs = jnp.asarray([[0, 0, 0, 1], [1, 0, 1, 0], [1, 1, 0, 0]], bool)
    got = np.asarray(dobj.obj_set_cover(xs, member))
    assert got[0] == -1 and got[1] == -2 and np.isinf(got[2]) and got[2] < 0

    kp = KnapsackInstance(0, 10.0, np.array([5.0, 6.0, 4.0]), np.array([10.0, 13.0, 7.0]))
    xs2 = jnp.asarray([[1, 0, 1], [1, 1, 0]], bool)
    got2 = np.asarray(
        dobj.obj_knapsack(xs2, jnp.asarray(kp.weights), jnp.asarray(kp.profits), kp.capacity)
    )
    assert got2[0] == 17.0 and np.isinf(got2[1])

    nums = jnp.asarray([4.0, 2.0, 2.0])
    got3 = np.asarray(dobj.obj_number_partitioning(jnp.asarray([[1, 0, 0]], bool), nums))
    assert got3[0] == 0.0


# ------------------------------------------------------------------ exact MILP
@pytest.fixture(scope="module")
def exact(small_graphs):
    g = small_graphs["ER_24"]
    return g, milp.solve_maxcut(g, time_limit=30.0)


def test_milp_maxcut_matches_host_score(exact):
    g, res = exact
    assert res.solution.size == g.num_nodes
    assert res.obj == hobj.obj_maxcut(res.solution, g)
    assert res.bound >= res.obj - 1e-6


def test_milp_mis_mvc_duality(small_graphs):
    g = small_graphs["ER_24"]
    mis = milp.solve_mis(g, 30.0)
    mvc = milp.solve_mvc(g, 30.0)
    # complement duality: MIS size + MVC size == n at optimality
    assert mis.obj + mvc.obj == g.num_nodes
    assert hobj.obj_maximum_independent_set(mis.solution, g) == mis.obj
    assert hobj.obj_minimum_vertex_cover(mvc.solution, g) == -mvc.obj


def test_milp_knapsack_and_setcover():
    kp = KnapsackInstance(0, 10.0, np.array([5.0, 6.0, 4.0]), np.array([10.0, 13.0, 7.0]))
    res = milp.solve_knapsack(kp)
    assert res.obj == 20.0  # items 1+2 (w=6+4=10, p=13+7)
    sc = SetCoverInstance(4, ((1, 2), (2, 3), (3, 4), (1, 2, 3, 4)))
    res2 = milp.solve_set_cover(sc)
    assert res2.obj == 1.0  # the universal set


# ----------------------------------------------------------------- heuristics
def test_greedy_maxcut_reaches_local_opt(small_graphs, exact):
    g, opt = exact
    bits, v = greedy_maxcut(g, num_starts=16)
    assert v == hobj.obj_maxcut(bits.astype(int), g)
    assert v >= 0.85 * opt.obj  # greedy multi-start should be close on 24 nodes


def test_sa_maxcut_beats_greedy_floor(small_graphs, exact):
    g, opt = exact
    bits, v = anneal_maxcut(g, SAConfig(num_chains=64, num_steps=1500))
    assert v == hobj.obj_maxcut(bits.astype(int), g)
    assert v >= 0.9 * opt.obj


def test_ga_maxcut(small_graphs, exact):
    g, opt = exact
    bits, v = genetic_maxcut(g, GAConfig(population=64, generations=10))
    assert v == hobj.obj_maxcut(bits.astype(int), g)
    assert v >= 0.9 * opt.obj


def test_random_walk_maxcut(small_graphs):
    g = small_graphs["BA_32"]
    bits, v = random_walk_maxcut(g, num_chains=64, num_steps=500)
    assert v == hobj.obj_maxcut(bits.astype(int), g)


def test_sdp_maxcut(small_graphs, exact):
    g, opt = exact
    bits, v = sdp_maxcut(g, SDPConfig(num_iters=200, num_roundings=128))
    assert v == hobj.obj_maxcut(bits.astype(int), g)
    assert v >= 0.878 * opt.obj  # GW guarantee (in expectation; holds easily here)


def test_greedy_other_problems(small_graphs):
    g = small_graphs["ER_24"]
    mis_bits, mis_v = greedy_mis(g)
    assert hobj.obj_maximum_independent_set(mis_bits.astype(int), g) == mis_v
    mvc_bits, mvc_v = greedy_mvc(g)
    assert hobj.obj_minimum_vertex_cover(mvc_bits.astype(int), g) == mvc_v
    gp_bits, gp_v = greedy_graph_partitioning(g)
    assert hobj.obj_graph_partitioning(gp_bits.astype(int), g) == gp_v
    assert np.isfinite(gp_v)
    sc = SetCoverInstance(4, ((1, 2), (2, 3), (3, 4), (1, 2, 3, 4)))
    sc_bits, sc_v = greedy_set_cover(sc)
    assert hobj.obj_set_cover(sc_bits.astype(int), sc) == sc_v


def test_generic_sa_on_mis(small_graphs):
    g = small_graphs["ER_24"]
    e = dobj.EdgeArrays.build(g)
    objective = lambda xs: dobj.obj_maximum_independent_set(xs, e, penalty=2.0)
    bits, v = anneal_bitvector(
        objective, g.num_nodes, SAConfig(num_chains=64, num_steps=1500)
    )
    host_v = hobj.obj_maximum_independent_set(bits.astype(int), g)
    assert np.isfinite(host_v), "SA returned an infeasible MIS"
    opt = milp.solve_mis(g, 30.0)
    assert host_v >= 0.7 * opt.obj


def test_set_cover_sa_swap_moves():
    """Reference-parity set-cover SA (`simulated_annealing_set_cover`):
    greedy-seeded swap moves must stay feasible and match or beat greedy."""
    from rlsolver_tpu.classical.simulated_annealing import anneal_set_cover

    rng = np.random.default_rng(0)
    num_items, num_sets = 30, 18
    subsets = []
    for i in range(num_items):  # singletons guarantee feasibility
        subsets.append((i + 1,))
    for _ in range(num_sets - num_items // 3):
        size = int(rng.integers(4, 12))
        subsets.append(tuple(int(x) + 1 for x in rng.choice(num_items, size, False)))
    sc = SetCoverInstance(num_items, tuple(subsets[: num_sets + num_items]))
    gr_bits, gr_v = greedy_set_cover(sc)
    bits, v = anneal_set_cover(sc, SAConfig(num_chains=64, num_steps=800, seed=1))
    assert v >= gr_v  # never worse than its own warm start
    assert hobj.obj_set_cover(bits.astype(int), sc) == v  # feasible + exact re-score


def test_sdp_no_perron_collapse_on_dense_er():
    """Regression: a fixed (degree-independent) step turned the Burer-
    Monteiro ascent into power iteration on (I - lr*A) on dense ER graphs,
    collapsing all vectors onto the Perron eigenvector (cut = 0)."""
    from rlsolver_tpu.core.generate import graph_from_name

    g = graph_from_name("ER_300_ID0")
    bits, v = sdp_maxcut(g, SDPConfig(seed=0))
    assert v == hobj.obj_maxcut(bits.astype(int), g)
    # random bipartition gives ~ m/2; Perron collapse gives 0
    assert v > 0.5 * g.num_edges
