"""Batched random-walk baseline (reference `rlsolver/methods/random_walk.py`):
uniform random single-bit flips, tracking the best solution seen."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.ops import cut as cut_ops


def random_walk_maxcut(
    graph: Graph, num_chains: int = 256, num_steps: int = 2000, seed: int = 0
) -> Tuple[np.ndarray, float]:
    cg = cut_ops.CutGraph.build(graph, dtype=jnp.float32)
    n = graph.num_nodes
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    xs = jax.random.bernoulli(k_init, 0.5, (num_chains, n))

    @jax.jit
    def run(key, xs):
        s = cut_ops.signs_from_bits(xs, jnp.float32)
        gains = cut_ops.flip_gains_dense(xs, cg)
        vs = cut_ops.cut_dense(xs, cg)
        best_s, best_vs = s, vs

        def body(carry, k):
            s, gains, vs, best_s, best_vs = carry
            nodes = jax.random.randint(k, (num_chains,), 0, n)
            rows = jnp.arange(num_chains)
            g = gains[rows, nodes]
            s_a = s[rows, nodes]
            adj_rows = jnp.take(cg.adj, nodes, axis=0).astype(jnp.float32)
            gains = gains - 2.0 * s_a[:, None] * s * adj_rows
            gains = gains.at[rows, nodes].set(-g)
            s = s.at[rows, nodes].multiply(-1.0)
            vs = vs + g
            better = vs > best_vs
            best_vs = jnp.where(better, vs, best_vs)
            best_s = jnp.where(better[:, None], s, best_s)
            return (s, gains, vs, best_s, best_vs), None

        keys = jax.random.split(key, num_steps)
        (s, gains, vs, best_s, best_vs), _ = jax.lax.scan(
            body, (s, gains, vs, best_s, best_vs), keys
        )
        return best_s > 0, best_vs

    bits, vs = run(key, xs)
    i = int(jnp.argmax(vs))
    return np.asarray(bits[i]), float(vs[i])
