"""Greedy construction/improvement baselines, batched over parallel starts.

Reference counterparts (`rlsolver/methods/greedy.py:33-336`): for each
problem, repeatedly take the best single-bit move until no move improves.
The reference scans all N flips per step in host python (O(N^2) per step);
here each greedy trajectory is a jitted `lax.while_loop` over incremental
flip gains, run for a whole batch of starts at once (the reference runs one
trajectory from one start).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.ops import cut as cut_ops
from rlsolver_tpu.ops import objectives as dobj


def greedy_maxcut(
    graph: Graph, num_starts: int = 1, key: jax.Array | None = None
) -> Tuple[np.ndarray, float]:
    """Steepest-ascent 1-flip greedy from `num_starts` starts.

    Start 0 is the all-zeros solution (the reference's deterministic start,
    `greedy.py:33-78`); the rest are random. Returns (best bits, best cut).
    """
    cg = cut_ops.CutGraph.build(graph, dtype=jnp.float32)
    n = graph.num_nodes
    key = key if key is not None else jax.random.PRNGKey(0)
    xs = jax.random.bernoulli(key, 0.5, (num_starts, n))
    xs = xs.at[0].set(False)

    @jax.jit
    def run(xs):
        s = cut_ops.signs_from_bits(xs, jnp.float32)
        gains = cut_ops.flip_gains_dense(xs, cg)
        vs = cut_ops.cut_dense(xs, cg)

        def cond(carry):
            _, gains, _ = carry
            return jnp.any(jnp.max(gains, axis=1) > 0)

        def body(carry):
            s, gains, vs = carry
            best = jnp.argmax(gains, axis=1)  # [B]
            g = jnp.take_along_axis(gains, best[:, None], axis=1)[:, 0]
            do = g > 0  # only envs that still improve
            rows = jnp.arange(s.shape[0])
            s_b = s[rows, best]
            adj_rows = jnp.take(cg.adj, best, axis=0).astype(jnp.float32)
            delta = -2.0 * (s_b * do)[:, None] * s * adj_rows
            gains = gains + delta
            gains = gains.at[rows, best].set(jnp.where(do, -g, g))
            s = s.at[rows, best].set(jnp.where(do, -s_b, s_b))
            vs = vs + jnp.where(do, g, 0.0)
            return s, gains, vs

        s, gains, vs = jax.lax.while_loop(cond, body, (s, gains, vs))
        return s > 0, vs

    bits, vs = run(xs)
    b = int(jnp.argmax(vs))
    return np.asarray(bits[b]), float(vs[b])


def greedy_mis(graph: Graph) -> Tuple[np.ndarray, float]:
    """Min-degree greedy independent set (host; the classic heuristic the
    reference's `greedy_MIS` implements, `greedy.py:164-220`)."""
    nbrs, _, deg = graph.padded_neighbors()
    alive = np.ones(graph.num_nodes, bool)
    chosen = np.zeros(graph.num_nodes, bool)
    deg = deg.astype(np.int64).copy()
    while alive.any():
        cand = np.where(alive)[0]
        v = cand[np.argmin(deg[cand])]
        chosen[v] = True
        alive[v] = False
        for u in nbrs[v]:
            if u < graph.num_nodes and alive[u]:
                alive[u] = False
                for w in nbrs[u]:
                    if w < graph.num_nodes:
                        deg[w] -= 1
    return chosen, float(chosen.sum())


def greedy_mvc(graph: Graph) -> Tuple[np.ndarray, float]:
    """Max-degree greedy vertex cover (reference `greedy_MVC`,
    `greedy.py:126-162`)."""
    n0, n1, _ = graph.edge_arrays()
    uncovered = np.ones(graph.num_edges, bool)
    chosen = np.zeros(graph.num_nodes, bool)
    while uncovered.any():
        cnt = np.zeros(graph.num_nodes, np.int64)
        np.add.at(cnt, n0[uncovered], 1)
        np.add.at(cnt, n1[uncovered], 1)
        v = int(cnt.argmax())
        chosen[v] = True
        uncovered &= ~((n0 == v) | (n1 == v))
    return chosen, -float(chosen.sum())


def greedy_set_cover(instance) -> Tuple[np.ndarray, float]:
    """Classic largest-marginal-cover greedy (reference `greedy_set_cover`,
    `greedy.py:222-260`)."""
    member = instance.membership_matrix()  # [S, I]
    covered = np.zeros(instance.num_items, bool)
    chosen = np.zeros(instance.num_sets, bool)
    while not covered.all():
        marginal = (member & ~covered[None, :]).sum(axis=1)
        marginal[chosen] = -1
        s = int(marginal.argmax())
        if marginal[s] <= 0:
            break  # uncoverable items
        chosen[s] = True
        covered |= member[s]
    return chosen, -float(chosen.sum())


def greedy_graph_partitioning(graph: Graph, key=None) -> Tuple[np.ndarray, float]:
    """Balanced partition via greedy swap improvement (reference
    `greedy_graph_partitioning`, `greedy.py:80-124`): start from an exact
    half/half split, repeatedly take the best cut-reducing swap pair."""
    n = graph.num_nodes
    x = np.zeros(n, np.int64)
    x[n // 2 :] = 1
    adj = graph.adjacency_dense().astype(np.float64)
    s = 2.0 * x - 1.0
    gains = s * (adj @ s)  # cut delta of flipping each node alone
    for _ in range(n):  # bounded number of improving swaps
        # swapping i (side 0) and j (side 1): cut delta = g_i + g_j + 2 A_ij
        # (for partitioning we MINIMIZE cut, so look for delta < 0)
        g0 = np.where(x == 0, gains, np.inf)
        g1 = np.where(x == 1, gains, np.inf)
        i = int(np.argmin(g0))
        j = int(np.argmin(g1))
        delta = gains[i] + gains[j] + 2 * adj[i, j]
        if delta >= 0:
            break
        s[i], s[j] = -s[i], -s[j]
        x[i], x[j] = 1 - x[i], 1 - x[j]
        gains = s * (adj @ s)
    from rlsolver_tpu.problems.objectives import obj_graph_partitioning

    return x.astype(bool), obj_graph_partitioning(x, graph)
