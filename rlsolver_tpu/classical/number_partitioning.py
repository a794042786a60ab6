"""Number partitioning: Karmarkar-Karp, brute force, batched annealing.

Reference counterpart: number partitioning is one of the 13 problems in the
reference's `Problem` enum (`methods/config.py:18-32`) with the objective
`obj_number_partitioning` (minimize |sum(A) - sum(B)|); the reference
solves it through its generic greedy/SA/Gurobi paths. Here the classic
largest-differencing (Karmarkar-Karp) heuristic and an exact brute force
join the batched device annealer.
"""

from __future__ import annotations

import heapq
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def partition_difference(numbers: np.ndarray, bits: np.ndarray) -> float:
    s = np.asarray(numbers, np.float64)
    return abs(float(s[bits].sum() - s[~bits].sum()))


def karmarkar_karp(numbers: Sequence[float]) -> Tuple[np.ndarray, float]:
    """Largest-differencing method; reconstructs the two sets by
    backtracking the merge tree. Returns (bits, |difference|)."""
    nums = np.asarray(numbers, np.float64)
    n = len(nums)
    # heap of (-value, id); merges recorded as (kept_id, absorbed_id)
    heap = [(-v, i) for i, v in enumerate(nums)]
    heapq.heapify(heap)
    next_id = n
    children = {}
    values = {i: v for i, v in enumerate(nums)}
    while len(heap) > 1:
        va, a = heapq.heappop(heap)
        vb, b = heapq.heappop(heap)
        diff = -va - (-vb)
        children[next_id] = (a, b)  # a gets +, b gets the opposite side
        heapq.heappush(heap, (-diff, next_id))
        next_id += 1
    root = heap[0][1] if heap else None
    side = np.zeros(next_id, np.int8)
    if root is not None:
        side[root] = 1
        for node in range(next_id - 1, n - 1, -1):
            a, b = children[node]
            side[a] = side[node]
            side[b] = -side[node]
    bits = side[:n] > 0
    return bits, partition_difference(nums, bits)


def brute_force_partition(numbers: Sequence[float]) -> Tuple[np.ndarray, float]:
    """Exact enumeration on device (n <= 24)."""
    nums = np.asarray(numbers, np.float64)
    n = len(nums)
    if n > 24:
        raise ValueError("brute force limited to n <= 24")
    codes = jnp.arange(2**n, dtype=jnp.uint32)
    bits = ((codes[:, None] >> jnp.arange(n, dtype=jnp.uint32)) & 1).astype(
        jnp.float32
    )
    signed = bits * 2.0 - 1.0
    diff = jnp.abs(signed @ jnp.asarray(nums, jnp.float32))
    best = int(jnp.argmin(diff))
    sel = np.asarray((best >> np.arange(n)) & 1, bool)
    return sel, partition_difference(nums, sel)


def anneal_partition(
    numbers: Sequence[float],
    key: jax.Array,
    num_chains: int = 256,
    num_steps: int = 2000,
) -> Tuple[np.ndarray, float]:
    """Batched single-flip annealing with incremental signed sums."""
    nums = jnp.asarray(np.asarray(numbers, np.float32))
    n = nums.shape[0]
    k_init, k_run = jax.random.split(key)
    bits = jax.random.bernoulli(k_init, 0.5, (num_chains, n))
    signed = jnp.where(bits, 1.0, -1.0) @ nums  # [C]
    t0 = float(np.abs(numbers).max()) + 1e-6
    temps = jnp.asarray(
        t0 * (0.001) ** (np.arange(num_steps) / max(1, num_steps - 1)), jnp.float32
    )

    def step(carry, inp):
        bits, signed, best_bits, best_diff = carry
        k, temp = inp
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (num_chains,), 0, n)
        cur = jnp.take_along_axis(bits, idx[:, None], axis=1)[:, 0]
        delta = jnp.where(cur, -2.0, 2.0) * nums[idx]
        new_signed = signed + delta
        d_old, d_new = jnp.abs(signed), jnp.abs(new_signed)
        accept_p = jnp.exp(jnp.minimum((d_old - d_new) / jnp.maximum(temp, 1e-9), 0.0))
        accept = jax.random.uniform(k2, (num_chains,)) < accept_p
        bits = jnp.where(
            accept[:, None] & (jnp.arange(n)[None] == idx[:, None]), ~bits, bits
        )
        signed = jnp.where(accept, new_signed, signed)
        improved = jnp.abs(signed) < best_diff
        best_bits = jnp.where(improved[:, None], bits, best_bits)
        best_diff = jnp.where(improved, jnp.abs(signed), best_diff)
        return (bits, signed, best_bits, best_diff), None

    keys = jax.random.split(k_run, num_steps)
    (bits, signed, best_bits, best_diff), _ = jax.lax.scan(
        step, (bits, signed, bits, jnp.abs(signed)), (keys, temps)
    )
    b = int(jnp.argmin(best_diff))
    sel = np.asarray(best_bits[b])
    return sel, partition_difference(np.asarray(numbers, np.float64), sel)
