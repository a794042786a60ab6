"""Host-side (numpy) reference objective functions.

Sign/feasibility conventions follow the reference exactly
(`rlsolver/methods/util_obj.py:31-178`): every objective is *maximized*,
infeasible solutions score -inf:

  maxcut               +sum of cut edge weights
  graph_partitioning   -cut size; -inf unless exactly n/2 nodes have label 0
  minimum_vertex_cover -(#selected); -inf unless every edge covered
  maximum_independent_set  +#selected; -inf if any edge inside the set
  set_cover            -(#selected sets); -inf unless all items covered
  graph_coloring       -(#distinct colors); -inf if any edge monochromatic
  knapsack             +sum profits; -inf if total weight > capacity
  number_partitioning  -|sum(S) - sum(~S)|

These are the slow golden twins of the batched device objectives in
`rlsolver_tpu.ops` (the reference's own correctness strategy, SURVEY.md
section 4 item 4). All take 0/1 numpy label vectors.
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.core.io import KnapsackInstance, SetCoverInstance

INF = float("inf")
Labels = Union[Sequence[int], np.ndarray]


def _bits(solution: Labels) -> np.ndarray:
    x = np.asarray(solution)
    return x.astype(np.int64)


def obj_maxcut(solution: Labels, graph: Graph) -> float:
    x = _bits(solution)
    n0, n1, w = graph.edge_arrays()
    return float(w[x[n0] != x[n1]].sum())


def obj_graph_partitioning(solution: Labels, graph: Graph) -> float:
    x = _bits(solution)
    if (x == 0).sum() * 2 != graph.num_nodes:
        return -INF
    return -obj_maxcut(solution, graph)


def obj_minimum_vertex_cover(solution: Labels, graph: Graph) -> float:
    x = _bits(solution)
    n0, n1, _ = graph.edge_arrays()
    if graph.num_edges and not np.all((x[n0] == 1) | (x[n1] == 1)):
        return -INF
    return -float((x == 1).sum())


def obj_maximum_independent_set(solution: Labels, graph: Graph) -> float:
    x = _bits(solution)
    n0, n1, _ = graph.edge_arrays()
    if graph.num_edges and np.any((x[n0] == 1) & (x[n1] == 1)):
        return -INF
    return float((x == 1).sum())


def obj_set_cover(solution: Labels, instance: SetCoverInstance) -> float:
    x = _bits(solution)
    member = instance.membership_matrix()  # [num_sets, num_items]
    covered = member[x == 1].any(axis=0) if (x == 1).any() else np.zeros(instance.num_items, bool)
    if not covered.all():
        return -INF
    return -float((x == 1).sum())


def obj_set_cover_ratio(solution: Labels, instance: SetCoverInstance) -> float:
    x = _bits(solution)
    member = instance.membership_matrix()
    covered = member[x == 1].any(axis=0) if (x == 1).any() else np.zeros(instance.num_items, bool)
    return float(covered.sum()) / float(instance.num_items)


def obj_graph_coloring(solution: Labels, graph: Graph) -> float:
    x = _bits(solution)
    n0, n1, _ = graph.edge_arrays()
    if graph.num_edges and np.any(x[n0] == x[n1]):
        return -INF
    return -float(len(np.unique(x)))


def obj_knapsack(solution: Labels, instance: KnapsackInstance) -> float:
    x = _bits(solution)
    if float((instance.weights * x).sum()) > instance.capacity:
        return -INF
    return float((instance.profits * x).sum())


def obj_number_partitioning(solution: Labels, numbers: Sequence[float]) -> float:
    x = _bits(solution)
    a = np.asarray(numbers, np.float64)
    return -abs(float((a * x).sum() - (a * (1 - x)).sum()))


def obj_tsp(tour: Labels, dist: np.ndarray) -> float:
    """Negative tour length for a permutation `tour` over dist matrix."""
    t = np.asarray(tour, np.int64)
    return -float(dist[t, np.roll(t, -1)].sum())
