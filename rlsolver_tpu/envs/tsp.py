"""Batched TSP environment: permutation states with vectorized 2-opt moves.

Reference counterpart: `ISCO_TSP` (`rlsolver/envs/env_ISCO.py:176-363`) —
permutation state per chain, vectorized 2-opt proposals mixing k-NN and
random candidates (`opt_2`, `:238-335`), delta-tour-length evaluation
(`:314-334`), Metropolis accepts, annealed chain. Also the substrate for the
classical TSP zoo (`methods_problem_specific/TSP/`).

State is `tours: int32 [B, N]` (city visited at position t). A 2-opt move
reverses positions i+1..j; its cost delta needs only 4 distance lookups:
    delta = d(a, c) + d(b, d) - d(a, b) - d(c, d)
with a=tour[i], b=tour[i+1], c=tour[j], d=tour[j+1 mod N]. The segment
reversal is a masked index remap (no scatter), so the whole annealed chain
jits into one `lax.scan`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TSPEnv:
    def __init__(self, dist: np.ndarray, knn_k: int = 10):
        self.num_cities = int(dist.shape[0])
        self.dist = jnp.asarray(dist, jnp.float32)
        k = min(knn_k, self.num_cities - 1)
        # k nearest neighbors per city (excluding self)
        order = np.argsort(np.asarray(dist) + np.eye(self.num_cities) * 1e18, axis=1)
        self.knn = jnp.asarray(order[:, :k].astype(np.int32))  # [N, k]
        self.knn_k = k

    # ------------------------------------------------------------------ state
    def random_tours(self, key: jax.Array, num_sims: int) -> jax.Array:
        perm = jax.vmap(lambda k: jax.random.permutation(k, self.num_cities))(
            jax.random.split(key, num_sims)
        )
        return perm.astype(jnp.int32)

    def nearest_neighbor_tours(self, key: jax.Array, num_sims: int) -> jax.Array:
        """Greedy nearest-neighbor construction from random start cities."""
        starts = jax.random.randint(key, (num_sims,), 0, self.num_cities)

        def build(start):
            def body(carry, _):
                tour, visited, cur, t = carry
                d = jnp.where(visited, jnp.inf, self.dist[cur])
                nxt = jnp.argmin(d)
                tour = tour.at[t].set(nxt.astype(jnp.int32))
                visited = visited.at[nxt].set(True)
                return (tour, visited, nxt, t + 1), None

            tour = jnp.zeros((self.num_cities,), jnp.int32).at[0].set(start)
            visited = jnp.zeros((self.num_cities,), bool).at[start].set(True)
            (tour, _, _, _), _ = jax.lax.scan(
                body, (tour, visited, start, 1), None, length=self.num_cities - 1
            )
            return tour

        return jax.vmap(build)(starts)

    def tour_length(self, tours: jax.Array) -> jax.Array:
        nxt = jnp.roll(tours, -1, axis=1)
        return self.dist[tours, nxt].sum(axis=1)

    # ------------------------------------------------------------------ 2-opt
    def propose_2opt(
        self, key: jax.Array, tours: jax.Array, knn_prob: float = 0.5
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Propose one 2-opt move per tour. Returns (i, j, delta) with
        i < j positions; delta = length change if positions i+1..j reverse.
        Candidate j is the position of a k-NN of city tour[i] with
        probability `knn_prob`, else uniform (reference mix,
        `env_ISCO.py:246-267`)."""
        b, n = tours.shape
        k_i, k_mix, k_nn, k_rand = jax.random.split(key, 4)
        i = jax.random.randint(k_i, (b,), 0, n)
        a_city = jnp.take_along_axis(tours, i[:, None], axis=1)[:, 0]
        # position of each city within each tour
        pos = jnp.zeros_like(tours).at[jnp.arange(b)[:, None], tours].set(
            jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
        )
        nn_choice = jax.random.randint(k_nn, (b,), 0, self.knn_k)
        nn_city = self.knn[a_city, nn_choice]
        j_knn = pos[jnp.arange(b), nn_city]
        j_rand = jax.random.randint(k_rand, (b,), 0, n)
        j = jnp.where(jax.random.uniform(k_mix, (b,)) < knn_prob, j_knn, j_rand)
        lo = jnp.minimum(i, j)
        hi = jnp.maximum(i, j)
        # degenerate pairs (lo==hi or wrap-around whole tour) get delta=0
        rows = jnp.arange(b)
        a = jnp.take_along_axis(tours, lo[:, None], axis=1)[:, 0]
        bb = jnp.take_along_axis(tours, ((lo + 1) % n)[:, None], axis=1)[:, 0]
        c = jnp.take_along_axis(tours, hi[:, None], axis=1)[:, 0]
        d = jnp.take_along_axis(tours, ((hi + 1) % n)[:, None], axis=1)[:, 0]
        delta = (
            self.dist[a, c] + self.dist[bb, d] - self.dist[a, bb] - self.dist[c, d]
        )
        degenerate = (lo == hi) | ((lo == 0) & (hi == n - 1))
        delta = jnp.where(degenerate, 0.0, delta)
        return lo, hi, delta

    @staticmethod
    def apply_2opt(tours: jax.Array, lo: jax.Array, hi: jax.Array, accept: jax.Array) -> jax.Array:
        """Reverse positions lo+1..hi (inclusive) where accept; index-remap
        formulation (no scatter)."""
        b, n = tours.shape
        t = jnp.arange(n, dtype=jnp.int32)[None, :]  # [1, N]
        lo_ = lo[:, None]
        hi_ = hi[:, None]
        inside = (t > lo_) & (t <= hi_)
        mirrored = lo_ + 1 + hi_ - t
        src = jnp.where(inside & accept[:, None], mirrored, t)
        return jnp.take_along_axis(tours, src, axis=1)

    # --------------------------------------------------------------- solvers
    def anneal(
        self,
        key: jax.Array,
        tours: jax.Array,
        num_steps: int = 5000,
        init_temp: float = 1.0,
        final_temp: float = 1e-3,
        knn_prob: float = 0.5,
    ) -> Tuple[jax.Array, jax.Array]:
        """Annealed batched 2-opt chain (ISCO_TSP capability); one jitted
        scan. Returns (best_tours, best_lengths)."""
        b, n = tours.shape
        decay = (final_temp / init_temp) ** (1.0 / num_steps)

        def body(carry, inp):
            tours, lengths, best_t, best_l, key = carry
            temp = inp
            key, k_prop, k_acc = jax.random.split(key, 3)
            lo, hi, delta = self.propose_2opt(k_prop, tours, knn_prob)
            accept = (delta < 0) | (
                jax.random.uniform(k_acc, (b,)) < jnp.exp(-delta / temp)
            )
            tours = self.apply_2opt(tours, lo, hi, accept)
            lengths = lengths + jnp.where(accept, delta, 0.0)
            better = lengths < best_l
            best_l = jnp.where(better, lengths, best_l)
            best_t = jnp.where(better[:, None], tours, best_t)
            return (tours, lengths, best_t, best_l, key), None

        temps = init_temp * decay ** jnp.arange(num_steps)
        lengths = self.tour_length(tours)
        init = (tours, lengths, tours, lengths, key)
        (tours, lengths, best_t, best_l, _), _ = jax.lax.scan(body, init, temps)
        return best_t, best_l

    def two_opt_descent(
        self, key: jax.Array, tours: jax.Array, num_steps: int = 5000, knn_prob: float = 0.75
    ) -> Tuple[jax.Array, jax.Array]:
        """Pure improving 2-opt (classical `opt_2.py` capability), batched."""

        def body(carry, k):
            tours, lengths = carry
            lo, hi, delta = self.propose_2opt(k, tours, knn_prob)
            accept = delta < 0
            tours = self.apply_2opt(tours, lo, hi, accept)
            lengths = lengths + jnp.where(accept, delta, 0.0)
            return (tours, lengths), None

        lengths = self.tour_length(tours)
        (tours, lengths), _ = jax.lax.scan(
            body, (tours, lengths), jax.random.split(key, num_steps)
        )
        return tours, lengths
