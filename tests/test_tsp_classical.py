"""Classical TSP zoo: constructions, batched 2-opt/3-opt, tabu, GA, GKSP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.core.generate import generate_tsp_coords
from rlsolver_tpu.core.io import tsp_distance_matrix
from rlsolver_tpu.classical.tsp import (
    cheapest_insertion_tour,
    christofides_tour,
    farthest_insertion_tour,
    genetic_tsp,
    karp_steele_tour,
    nearest_insertion_tour,
    nearest_neighbor_tour,
    tabu_search,
    two_opt_best_improvement,
    or_opt_moves,
)
from rlsolver_tpu.problems.objectives import obj_tsp


@pytest.fixture(scope="module")
def inst():
    coords = generate_tsp_coords(1, 20, seed=0)[0]
    dist = tsp_distance_matrix(coords)
    return dist


def tour_len(tour, dist):
    return -obj_tsp(np.asarray(tour), dist)  # obj_tsp is negated (maximize)


def assert_valid_tour(tour, n):
    assert sorted(np.asarray(tour).tolist()) == list(range(n))


CONSTRUCTIONS = [
    nearest_neighbor_tour,
    nearest_insertion_tour,
    farthest_insertion_tour,
    cheapest_insertion_tour,
    christofides_tour,
    karp_steele_tour,
]


@pytest.mark.parametrize("construct", CONSTRUCTIONS)
def test_constructions_valid_and_beat_identity(construct, inst):
    n = inst.shape[0]
    tour = construct(inst)
    assert_valid_tour(tour, n)
    identity = tour_len(np.arange(n), inst)
    assert tour_len(tour, inst) < identity


def test_christofides_approx_bound(inst):
    # christofides <= 1.5 * optimum; vs the best of all constructions + 2opt
    tours = np.stack([c(inst) for c in CONSTRUCTIONS])
    improved, lengths = two_opt_best_improvement(jnp.asarray(tours), jnp.asarray(inst))
    best = float(np.min(np.asarray(lengths)))
    assert tour_len(christofides_tour(inst), inst) <= 1.5 * best + 1e-6


def test_two_opt_monotone_and_matches_host_length(inst):
    n = inst.shape[0]
    key = jax.random.PRNGKey(0)
    tours = jnp.stack(
        [jax.random.permutation(jax.random.fold_in(key, i), n) for i in range(6)]
    )
    before = np.asarray([tour_len(t, inst) for t in np.asarray(tours)])
    out, lengths = jax.jit(
        lambda t: two_opt_best_improvement(t, jnp.asarray(inst), max_iters=100)
    )(tours)
    after = np.asarray(lengths)
    for b in range(6):
        assert_valid_tour(np.asarray(out[b]), n)
        assert after[b] <= before[b] + 1e-4
        # device length agrees with host objective
        assert abs(tour_len(np.asarray(out[b]), inst) - after[b]) < 1e-3


def test_or_opt_improves(inst):
    n = inst.shape[0]
    key = jax.random.PRNGKey(1)
    tours = jnp.stack(
        [jax.random.permutation(jax.random.fold_in(key, i), n) for i in range(4)]
    )
    out, lengths = jax.jit(
        lambda k, t: or_opt_moves(k, t, jnp.asarray(inst), num_iters=100)
    )(key, tours)
    before = np.asarray([tour_len(t, inst) for t in np.asarray(tours)])
    for b in range(4):
        assert_valid_tour(np.asarray(out[b]), n)
        assert float(lengths[b]) <= before[b] + 1e-4


def test_tabu_beats_random(inst):
    n = inst.shape[0]
    key = jax.random.PRNGKey(2)
    tours = jnp.stack(
        [jax.random.permutation(jax.random.fold_in(key, i), n) for i in range(4)]
    )
    out, lengths = jax.jit(
        lambda k, t: tabu_search(k, t, jnp.asarray(inst), num_iters=60)
    )(key, tours)
    before = np.asarray([tour_len(t, inst) for t in np.asarray(tours)])
    for b in range(4):
        assert_valid_tour(np.asarray(out[b]), n)
        assert float(lengths[b]) < before[b]


def test_genetic_tsp(inst):
    tour, length = genetic_tsp(
        jax.random.PRNGKey(3), inst, pop_size=24, num_generations=20
    )
    assert_valid_tour(tour, inst.shape[0])
    assert abs(tour_len(tour, inst) - length) < 1e-3
    nn_len = tour_len(nearest_neighbor_tour(inst), inst)
    assert length < nn_len * 1.3  # in the same ballpark as NN at least


def test_three_opt_true():
    from rlsolver_tpu.classical.tsp import three_opt_tour

    coords = generate_tsp_coords(1, 32, seed=5)[0]
    dist = tsp_distance_matrix(coords)
    n = dist.shape[0]
    start = nearest_neighbor_tour(dist)
    t3, len3 = three_opt_tour(dist, start)
    assert_valid_tour(t3, n)
    assert abs(len3 - tour_len(t3, dist)) < 1e-6
    assert len3 <= tour_len(start, dist) + 1e-9
    # 3-opt moves are a superset of 2-opt moves: from the same start the
    # 3-opt local optimum is never worse than the 2-opt one
    t2, len2 = two_opt_best_improvement(jnp.asarray(start)[None], jnp.asarray(dist))
    assert len3 <= float(len2[0]) + 1e-5
    # the result is 2-opt-stable (no residual 2-opt move improves it)
    _, len2_after = two_opt_best_improvement(jnp.asarray(t3)[None], jnp.asarray(dist))
    assert float(len2_after[0]) >= len3 - 1e-5


def test_three_opt_fixes_segment_swap():
    """A tour needing a pure segment exchange (a 3-opt move that no single
    2-opt reversal can make profitable on this metric) is repaired."""
    from rlsolver_tpu.classical.tsp import three_opt_tour

    # six points on a line; optimal tour visits them in order
    coords = np.array([[float(i), 0.0] for i in range(6)])
    d = tsp_distance_matrix(coords)
    bad = np.array([0, 3, 4, 1, 2, 5])  # segments [3,4] and [1,2] swapped
    t3, len3 = three_opt_tour(d, bad)
    assert len3 <= tour_len(np.arange(6), d) + 1e-9
