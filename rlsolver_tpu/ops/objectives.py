"""Batched device objectives for bit-vector CO problems.

Each function is the batched device counterpart of a host golden function in
`rlsolver_tpu.problems.objectives` (reference `rlsolver/methods/util_obj.py`),
vectorized over a [B, N] batch of 0/1 solutions. Feasibility handling comes
in two flavors:

  * exact:     infeasible -> -inf (matches the reference's -INF convention);
  * penalized: infeasible -> objective - penalty * violation_count, the form
    annealers/samplers need for a usable search gradient (the reference's
    QUBO formulations do the same inside Gurobi, `gurobi.py:331-354`).

All reductions are gathers/matmuls over static shapes; every function is
jit/vmap/shard_map-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.core.io import KnapsackInstance, SetCoverInstance

NEG_INF = -jnp.inf


class EdgeArrays(NamedTuple):
    n0: jax.Array  # [m] int32
    n1: jax.Array  # [m] int32
    w: jax.Array  # [m] f32

    @staticmethod
    def build(graph: Graph) -> "EdgeArrays":
        n0, n1, w = graph.edge_arrays()
        return EdgeArrays(jnp.asarray(n0), jnp.asarray(n1), jnp.asarray(w))


def _endpoints(xs: jax.Array, e: EdgeArrays):
    xb = xs.astype(jnp.int8)
    return xb[:, e.n0], xb[:, e.n1]


# ----------------------------------------------------------------- objectives
def obj_maxcut(xs: jax.Array, e: EdgeArrays) -> jax.Array:
    a, b = _endpoints(xs, e)
    return ((a ^ b).astype(jnp.float32) * e.w[None, :]).sum(axis=1)


def obj_graph_partitioning(
    xs: jax.Array, e: EdgeArrays, num_nodes: int, penalty: Optional[float] = None
) -> jax.Array:
    """-cut, balanced halves. Balance violation = |#zeros - n/2|."""
    cut = obj_maxcut(xs, e)
    zeros = (num_nodes - xs.astype(jnp.int32).sum(axis=1)).astype(jnp.float32)
    violation = jnp.abs(zeros - num_nodes / 2.0)
    if penalty is None:
        return jnp.where(violation == 0, -cut, NEG_INF)
    return -cut - penalty * violation


def obj_minimum_vertex_cover(
    xs: jax.Array, e: EdgeArrays, penalty: Optional[float] = None
) -> jax.Array:
    a, b = _endpoints(xs, e)
    uncovered = ((1 - a) & (1 - b)).astype(jnp.float32).sum(axis=1)
    count = xs.astype(jnp.float32).sum(axis=1)
    if penalty is None:
        return jnp.where(uncovered == 0, -count, NEG_INF)
    return -count - penalty * uncovered


def obj_maximum_independent_set(
    xs: jax.Array, e: EdgeArrays, penalty: Optional[float] = None
) -> jax.Array:
    a, b = _endpoints(xs, e)
    violations = (a & b).astype(jnp.float32).sum(axis=1)
    count = xs.astype(jnp.float32).sum(axis=1)
    if penalty is None:
        return jnp.where(violations == 0, count, NEG_INF)
    return count - penalty * violations


def obj_set_cover(
    xs: jax.Array, membership: jax.Array, penalty: Optional[float] = None
) -> jax.Array:
    """xs: [B, num_sets]; membership: [num_sets, num_items] bool/0-1."""
    cover_counts = jnp.matmul(
        xs.astype(jnp.float32), membership.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # [B, num_items]
    uncovered = (cover_counts == 0).astype(jnp.float32).sum(axis=1)
    count = xs.astype(jnp.float32).sum(axis=1)
    if penalty is None:
        return jnp.where(uncovered == 0, -count, NEG_INF)
    return -count - penalty * uncovered


def obj_knapsack(
    xs: jax.Array,
    weights: jax.Array,
    profits: jax.Array,
    capacity: float,
    penalty: Optional[float] = None,
) -> jax.Array:
    load = xs.astype(jnp.float32) @ weights
    profit = xs.astype(jnp.float32) @ profits
    over = jnp.maximum(load - capacity, 0.0)
    if penalty is None:
        return jnp.where(over == 0, profit, NEG_INF)
    return profit - penalty * over


def obj_number_partitioning(xs: jax.Array, numbers: jax.Array) -> jax.Array:
    a = numbers.astype(jnp.float32)
    return -jnp.abs(xs.astype(jnp.float32) @ a - (1 - xs.astype(jnp.float32)) @ a)


def obj_graph_coloring(
    labels: jax.Array, e: EdgeArrays, num_colors: int, penalty: Optional[float] = None
) -> jax.Array:
    """labels: int [B, N] color per node; objective = -#used colors."""
    conflicts = (labels[:, e.n0] == labels[:, e.n1]).astype(jnp.float32).sum(axis=1)
    onehot = jax.nn.one_hot(labels, num_colors, dtype=jnp.float32)  # [B, N, C]
    used = (onehot.sum(axis=1) > 0).astype(jnp.float32).sum(axis=1)
    if penalty is None:
        return jnp.where(conflicts == 0, -used, NEG_INF)
    return -used - penalty * conflicts


def obj_tsp(tours: jax.Array, dist: jax.Array) -> jax.Array:
    """tours: int [B, N] permutations; dist: [N, N]. Returns -tour length."""
    nxt = jnp.roll(tours, -1, axis=1)
    return -dist[tours, nxt].sum(axis=1)
