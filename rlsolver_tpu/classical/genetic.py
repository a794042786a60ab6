"""Batched genetic algorithm with tabu-flavoured local improvement.

Reference counterpart (`rlsolver/methods/genetic_algorithm.py:37-239`):
population of bitstrings, tournament-free fitness-ranked selection, uniform
crossover, bit-flip mutation, and a tabu-ish local search on offspring. Here
the whole generation (selection, crossover, mutation, one greedy sweep) is
one jitted program over the population axis.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.envs.maxcut import MaxcutEnv


@dataclasses.dataclass
class GAConfig:
    population: int = 128
    generations: int = 40
    mutation_rate: float = 0.02
    elite_frac: float = 0.25
    seed: int = 0


def genetic_maxcut(graph: Graph, cfg: GAConfig = GAConfig()) -> Tuple[np.ndarray, float]:
    env = MaxcutEnv(graph, dtype=jnp.float32)
    n = graph.num_nodes
    pop = cfg.population
    n_elite = max(1, int(pop * cfg.elite_frac))
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    xs = env.random_xs(k_init, pop)

    @jax.jit
    def generation(key, xs, vs):
        k_sel, k_cross, k_mut = jax.random.split(key, 3)
        order = jnp.argsort(-vs)  # best first
        elite = xs[order[:n_elite]]
        # parents sampled fitness-ranked (linear rank weights)
        ranks = jnp.arange(pop, 0, -1).astype(jnp.float32)
        probs = ranks / ranks.sum()
        parents_idx = jax.random.choice(
            k_sel, pop, shape=(2, pop - n_elite), p=probs
        )
        pa = xs[order[parents_idx[0]]]
        pb = xs[order[parents_idx[1]]]
        mask = jax.random.bernoulli(k_cross, 0.5, pa.shape)
        children = jnp.where(mask, pa, pb)
        mut = jax.random.bernoulli(k_mut, cfg.mutation_rate, children.shape)
        children = jnp.logical_xor(children, mut)
        xs_new = jnp.concatenate([elite, children], axis=0)
        # one greedy 1-flip sweep as the local-improvement operator
        vs_new = env.obj(xs_new)
        xs_new, vs_new = env.sweep_1flip(xs_new, vs_new)
        return xs_new, vs_new

    vs = env.obj(xs)
    xs, vs = env.sweep_1flip(xs, vs)
    for _ in range(cfg.generations):
        key, k = jax.random.split(key)
        xs, vs = generation(k, xs, vs)
    i = int(jnp.argmax(vs))
    return np.asarray(xs[i]), float(vs[i])
