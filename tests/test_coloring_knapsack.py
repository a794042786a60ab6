"""Graph-coloring heuristics and the knapsack solver zoo."""

import jax
import numpy as np
import pytest

from rlsolver_tpu.core.generate import generate_knapsack, graph_from_name
from rlsolver_tpu.classical.coloring import (
    dsatur,
    greedy_coloring,
    is_proper_coloring,
    recursive_largest_first,
    welsh_powell,
)
from rlsolver_tpu.classical.knapsack import (
    branch_and_bound_knapsack,
    brute_force_knapsack,
    dp_knapsack,
    fptas_knapsack,
    greedy_knapsack,
    sa_knapsack,
)


COLORERS = [greedy_coloring, welsh_powell, dsatur, recursive_largest_first]


@pytest.mark.parametrize("colorer", COLORERS)
def test_coloring_proper(colorer):
    for name in ("BA_32_ID0", "ER_24_ID1", "PL_40_ID2"):
        g = graph_from_name(name)
        colors, k = colorer(g)
        assert is_proper_coloring(g, colors)
        assert k == colors.max() + 1
        assert k <= int(g.degrees().max()) + 1  # greedy bound


def test_dsatur_not_worse_than_greedy_on_crown():
    # crown-like bipartite-ish instance where DSATUR shines
    import networkx as nx

    from rlsolver_tpu.core.graph import Graph

    g = Graph.from_networkx(nx.complete_bipartite_graph(5, 5))
    _, k_dsatur = dsatur(g)
    assert k_dsatur == 2


@pytest.fixture(scope="module")
def knap():
    return generate_knapsack(16, seed=3)


def test_exact_solvers_agree(knap):
    _, v_dp = dp_knapsack(knap)
    _, v_bf = brute_force_knapsack(knap)
    _, v_bb = branch_and_bound_knapsack(knap)
    assert abs(v_dp - v_bf) < 1e-6
    assert abs(v_bb - v_bf) < 1e-6


def test_heuristics_feasible_and_bounded(knap):
    w = np.asarray(knap.weights)
    _, v_opt = brute_force_knapsack(knap)
    for solver in (greedy_knapsack, lambda i: fptas_knapsack(i, eps=0.2)):
        bits, v = solver(knap)
        assert w[bits].sum() <= knap.capacity + 1e-9
        assert v <= v_opt + 1e-9
    bits, v = fptas_knapsack(knap, eps=0.1)
    assert v >= (1 - 0.1) * v_opt - 1e-9  # FPTAS guarantee


def test_sa_knapsack(knap):
    w = np.asarray(knap.weights)
    bits, v = sa_knapsack(knap, jax.random.PRNGKey(0), num_chains=64, num_steps=500)
    assert w[bits].sum() <= knap.capacity + 1e-9
    _, v_greedy = greedy_knapsack(knap)
    assert v >= 0.9 * v_greedy
