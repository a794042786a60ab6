"""Batched simulated annealing over single-bit flips.

Reference counterpart (`rlsolver/methods/simulated_annealing.py:41-277`):
one chain, init from greedy, geometric temperature decay, one random flip
proposal per step accepted by the Metropolis rule. Here: `num_chains`
chains annealed in lockstep inside one jitted `lax.scan`, with incremental
flip gains for maxcut (O(N) per step per chain) and a generic
penalized-objective path for the other bit-vector problems.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.ops import cut as cut_ops


@dataclasses.dataclass
class SAConfig:
    num_chains: int = 256
    num_steps: int = 2000
    init_temperature: float = 4.0
    final_temperature: float = 1e-2
    seed: int = 0


def anneal_maxcut(graph: Graph, cfg: SAConfig = SAConfig()) -> Tuple[np.ndarray, float]:
    """Returns (best bits [n], best cut). Fully jitted scan."""
    cg = cut_ops.CutGraph.build(graph, dtype=jnp.float32)
    n = graph.num_nodes
    b = cfg.num_chains
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    xs = jax.random.bernoulli(k_init, 0.5, (b, n))
    decay = (cfg.final_temperature / cfg.init_temperature) ** (1.0 / cfg.num_steps)

    @jax.jit
    def run(key, xs):
        s = cut_ops.signs_from_bits(xs, jnp.float32)
        gains = cut_ops.flip_gains_dense(xs, cg)
        vs = cut_ops.cut_dense(xs, cg)
        best_s, best_vs = s, vs

        def body(carry, inp):
            s, gains, vs, best_s, best_vs = carry
            k, temp = inp
            k1, k2 = jax.random.split(k)
            nodes = jax.random.randint(k1, (b,), 0, n)
            rows = jnp.arange(b)
            g = gains[rows, nodes]
            accept = jax.random.uniform(k2, (b,)) < jnp.exp(jnp.minimum(g / temp, 0.0))
            accept = accept | (g > 0)
            s_a = s[rows, nodes]
            adj_rows = jnp.take(cg.adj, nodes, axis=0).astype(jnp.float32)
            delta = -2.0 * (s_a * accept)[:, None] * s * adj_rows
            gains = gains + delta
            gains = gains.at[rows, nodes].set(jnp.where(accept, -g, g))
            s = s.at[rows, nodes].set(jnp.where(accept, -s_a, s_a))
            vs = vs + jnp.where(accept, g, 0.0)
            better = vs > best_vs
            best_vs = jnp.where(better, vs, best_vs)
            best_s = jnp.where(better[:, None], s, best_s)
            return (s, gains, vs, best_s, best_vs), None

        temps = cfg.init_temperature * decay ** jnp.arange(cfg.num_steps)
        keys = jax.random.split(key, cfg.num_steps)
        (s, gains, vs, best_s, best_vs), _ = jax.lax.scan(
            body, (s, gains, vs, best_s, best_vs), (keys, temps)
        )
        return best_s > 0, best_vs

    bits, vs = run(key, xs)
    i = int(jnp.argmax(vs))
    return np.asarray(bits[i]), float(vs[i])


def anneal_set_cover(instance, cfg: SAConfig = SAConfig()) -> Tuple[np.ndarray, float]:
    """Set-cover SA with the reference's swap moves
    (`simulated_annealing_set_cover`, reference
    `rlsolver/methods/simulated_annealing.py:41-105`): start from greedy,
    each step adds one unselected set and removes two selected ones (one
    with probability 0.05), Metropolis-accepted under a linearly decaying
    temperature; infeasible (uncovered) proposals score -inf and are never
    accepted. Here: `num_chains` chains in one jitted scan, with the
    selected/unselected draws as masked Gumbel top-k. Returns (bits [S],
    score = -num_selected, higher better).
    """
    from rlsolver_tpu.classical.greedy import greedy_set_cover

    member = jnp.asarray(instance.membership_matrix(), jnp.float32)  # [S, I]
    num_sets, num_items = member.shape
    gr_bits, _ = greedy_set_cover(instance)
    b = cfg.num_chains
    xs = jnp.broadcast_to(jnp.asarray(gr_bits, bool), (b, num_sets))
    key = jax.random.PRNGKey(cfg.seed)

    def objective(xs):
        covered = (xs.astype(jnp.float32) @ member) > 0  # [B, I]
        feasible = covered.all(axis=1)
        return jnp.where(feasible, -xs.sum(axis=1).astype(jnp.float32), -jnp.inf)

    @jax.jit
    def run(key, xs):
        vs = objective(xs)
        best_xs, best_vs = xs, vs

        def masked_pick(k, mask, num):
            """Gumbel top-`num` indices among mask=True columns, [B, num]."""
            gumbel = -jnp.log(-jnp.log(jax.random.uniform(k, mask.shape) + 1e-12))
            scores = jnp.where(mask, gumbel, -jnp.inf)
            _, idx = jax.lax.top_k(scores, num)
            return idx

        def body(carry, inp):
            xs, vs, best_xs, best_vs = carry
            k, temp = inp
            k1, k2, k3, k4 = jax.random.split(k, 4)
            rows = jnp.arange(b)[:, None]
            set_in = masked_pick(k1, ~xs, 1)
            prop = xs.at[rows, set_in].set(True)
            outs = masked_pick(k2, xs, 2)  # two selected sets to drop
            drop_one = jax.random.uniform(k3, (b, 1)) < 0.05
            keep_second = drop_one | (jnp.sum(xs, axis=1, keepdims=True) < 2)
            prop = prop.at[rows, outs[:, :1]].set(False)
            prop = jnp.where(
                keep_second, prop, prop.at[rows, outs[:, 1:]].set(False)
            )
            vs_prop = objective(prop)
            g = vs_prop - vs
            accept = (g > 0) | (
                jax.random.uniform(k4, (b,)) < jnp.exp(jnp.minimum(g / temp, 0.0))
            )
            accept = accept & jnp.isfinite(vs_prop)
            xs = jnp.where(accept[:, None], prop, xs)
            vs = jnp.where(accept, vs_prop, vs)
            better = vs > best_vs
            best_vs = jnp.where(better, vs, best_vs)
            best_xs = jnp.where(better[:, None], xs, best_xs)
            return (xs, vs, best_xs, best_vs), None

        # reference: temperature = T0 * (1 - (k+1)/num_steps), linear decay
        temps = cfg.init_temperature * (
            1.0 - (jnp.arange(cfg.num_steps) + 1.0) / cfg.num_steps
        ) + 1e-6
        keys = jax.random.split(key, cfg.num_steps)
        (xs, vs, best_xs, best_vs), _ = jax.lax.scan(
            body, (xs, vs, best_xs, best_vs), (keys, temps)
        )
        return best_xs, best_vs

    bits, vs = run(key, xs)
    i = int(jnp.argmax(vs))
    return np.asarray(bits[i]), float(vs[i])


def anneal_bitvector(
    objective: Callable[[jax.Array], jax.Array],
    num_bits: int,
    cfg: SAConfig = SAConfig(),
    init_bits: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, float]:
    """Generic SA for any batched bit-vector objective ([B, N] -> [B], higher
    better, penalized form recommended). Proposal = one uniform bit flip.
    Used for MIS / MVC / set-cover / knapsack / number-partitioning
    (reference drives the same problems through `simulated_annealing:108`).
    """
    b = cfg.num_chains
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    if init_bits is None:
        xs = jax.random.bernoulli(k_init, 0.5, (b, num_bits))
    else:
        xs = jnp.broadcast_to(init_bits, (b, num_bits))
    decay = (cfg.final_temperature / cfg.init_temperature) ** (1.0 / cfg.num_steps)

    @jax.jit
    def run(key, xs):
        vs = objective(xs)
        best_xs, best_vs = xs, vs

        def body(carry, inp):
            xs, vs, best_xs, best_vs = carry
            k, temp = inp
            k1, k2 = jax.random.split(k)
            nodes = jax.random.randint(k1, (b,), 0, num_bits)
            rows = jnp.arange(b)
            prop = xs.at[rows, nodes].set(~xs[rows, nodes])
            vs_prop = objective(prop)
            g = vs_prop - vs
            accept = (g > 0) | (
                jax.random.uniform(k2, (b,)) < jnp.exp(jnp.minimum(g / temp, 0.0))
            )
            # -inf proposals (hard-infeasible) are never accepted
            accept = accept & jnp.isfinite(vs_prop)
            xs = jnp.where(accept[:, None], prop, xs)
            vs = jnp.where(accept, vs_prop, vs)
            better = vs > best_vs
            best_vs = jnp.where(better, vs, best_vs)
            best_xs = jnp.where(better[:, None], xs, best_xs)
            return (xs, vs, best_xs, best_vs), None

        temps = cfg.init_temperature * decay ** jnp.arange(cfg.num_steps)
        keys = jax.random.split(key, cfg.num_steps)
        (xs, vs, best_xs, best_vs), _ = jax.lax.scan(
            body, (xs, vs, best_xs, best_vs), (keys, temps)
        )
        return best_xs, best_vs

    bits, vs = run(key, xs)
    i = int(jnp.argmax(vs))
    return np.asarray(bits[i]), float(vs[i])
