"""Number partitioning: Karmarkar-Karp, brute force, annealing."""

import jax
import numpy as np
import pytest

from rlsolver_tpu.classical.number_partitioning import (
    anneal_partition,
    brute_force_partition,
    karmarkar_karp,
    partition_difference,
)


@pytest.fixture(scope="module")
def numbers():
    rng = np.random.RandomState(0)
    return rng.randint(1, 1000, 18).astype(np.float64)


def test_kk_consistency(numbers):
    bits, diff = karmarkar_karp(numbers)
    assert diff == partition_difference(numbers, bits)
    # KK is at least as good as the sorted-greedy split
    order = np.argsort(-numbers)
    greedy = np.zeros(len(numbers), bool)
    s = [0.0, 0.0]
    for i in order:
        side = int(s[1] < s[0])
        greedy[i] = side == 1
        s[side] += numbers[i]
    assert diff <= partition_difference(numbers, greedy) + 1e-9


def test_brute_force_optimal(numbers):
    bits, diff = brute_force_partition(numbers)
    assert diff == partition_difference(numbers, bits)
    _, kk_diff = karmarkar_karp(numbers)
    assert diff <= kk_diff + 1e-9


def test_anneal_close_to_optimal(numbers):
    _, opt = brute_force_partition(numbers)
    bits, diff = anneal_partition(numbers, jax.random.PRNGKey(0), num_chains=128)
    assert diff == partition_difference(numbers, bits)
    assert diff <= opt + 2.0 * numbers.max() / 100  # near-optimal


def test_kk_perfect_partition():
    # differencing chain: (6,4)->2, (2,2)->0 => {6} vs {4,2}, difference 0
    # (note KK is a heuristic: on {4,5,6,7,8} it returns 2, not the optimal 0)
    bits, diff = karmarkar_karp([6, 4, 2])
    assert diff == 0.0
    nums = np.asarray([6.0, 4.0, 2.0])
    assert abs(nums[bits].sum() - nums[~bits].sum()) == 0.0
