"""Graph-coloring heuristics.

Reference counterpart: `rlsolver/methods_problem_specific/graph_coloring/`
— greedy (first-fit), Welsh-Powell, DSATUR (`degree_of_saturation.py`), and
recursive largest-first. All are inherently sequential orderings over small
graphs, so they are host-side numpy; the batched/device path for coloring is
the penalty objective `obj_graph_coloring` + Pattern-II policy methods.

All return (colors [n] int32 with colors in 0..k-1, k).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from rlsolver_tpu.core.graph import Graph


def _color_order(graph: Graph, order) -> Tuple[np.ndarray, int]:
    """First-fit coloring along `order`."""
    nbrs, _, deg = graph.padded_neighbors()
    colors = np.full(graph.num_nodes, -1, np.int32)
    for v in order:
        used = {int(colors[nbrs[v, k]]) for k in range(deg[v]) if colors[nbrs[v, k]] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors, int(colors.max(initial=-1)) + 1


def greedy_coloring(graph: Graph) -> Tuple[np.ndarray, int]:
    """First-fit in natural node order (`graph_coloring/greedy.py`)."""
    return _color_order(graph, range(graph.num_nodes))


def welsh_powell(graph: Graph) -> Tuple[np.ndarray, int]:
    """First-fit in descending-degree order (`welsh_powell.py`)."""
    return _color_order(graph, np.argsort(-graph.degrees(), kind="stable"))


def dsatur(graph: Graph) -> Tuple[np.ndarray, int]:
    """DSATUR (`degree_of_saturation.py`): repeatedly color the uncolored
    node with the most distinct neighbor colors (ties by degree)."""
    n = graph.num_nodes
    nbrs, _, deg = graph.padded_neighbors()
    colors = np.full(n, -1, np.int32)
    sat = [set() for _ in range(n)]
    for _ in range(n):
        best, best_key = -1, (-1, -1)
        for v in range(n):
            if colors[v] >= 0:
                continue
            key = (len(sat[v]), int(deg[v]))
            if key > best_key:
                best, best_key = v, key
        c = 0
        while c in sat[best]:
            c += 1
        colors[best] = c
        for k in range(deg[best]):
            sat[int(nbrs[best, k])].add(c)
    return colors, int(colors.max(initial=-1)) + 1


def recursive_largest_first(graph: Graph) -> Tuple[np.ndarray, int]:
    """RLF (`recursive_largest_first.py`): build one maximal independent set
    per color, preferring nodes with many uncolored neighbors."""
    n = graph.num_nodes
    adj = graph.adjacency_dense() > 0
    colors = np.full(n, -1, np.int32)
    color = 0
    uncolored = np.ones(n, bool)
    while uncolored.any():
        candidates = uncolored.copy()
        in_class = np.zeros(n, bool)
        while candidates.any():
            # pick the candidate with most neighbors outside the candidate set
            score = (adj[:, uncolored & ~candidates]).sum(axis=1)
            score = np.where(candidates, score, -1)
            v = int(score.argmax())
            in_class[v] = True
            candidates[v] = False
            candidates &= ~adj[v]
        colors[in_class] = color
        uncolored &= ~in_class
        color += 1
    return colors, color


def is_proper_coloring(graph: Graph, colors: np.ndarray) -> bool:
    a, b = graph.edges[:, 0], graph.edges[:, 1]
    return bool((colors[a] != colors[b]).all()) and colors.min(initial=0) >= 0
