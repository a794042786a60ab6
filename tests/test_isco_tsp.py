"""ISCO sampler math + TSP env tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.algos.isco import (
    ISCOConfig,
    noreplacement_renormalize,
    reverse_ll,
    sample_flip_set,
    solve_maxcut_isco,
    solve_mis_isco,
)
from rlsolver_tpu.core.generate import generate_tsp_coords
from rlsolver_tpu.core.io import tsp_distance_matrix
from rlsolver_tpu.envs.tsp import TSPEnv
from rlsolver_tpu.problems.objectives import (
    obj_maxcut,
    obj_maximum_independent_set,
    obj_tsp,
)
from rlsolver_tpu.solvers import milp


def test_noreplacement_renormalize_matches_sequential():
    """Entry t equals log P(item_t) after removing items 0..t-1."""
    p = np.array([0.5, 0.3, 0.2])
    ll = jnp.log(jnp.asarray(p))[None, :]
    out = np.asarray(noreplacement_renormalize(ll))[0]
    want = [np.log(0.5), np.log(0.3 / 0.5), np.log(0.2 / 0.2)]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_sample_flip_set_sizes():
    key = jax.random.PRNGKey(0)
    log_prob = jnp.log(jnp.full((6, 10), 0.1))
    path_length = jnp.asarray([1, 2, 3, 4, 5, 10], jnp.int32)
    info = sample_flip_set(key, log_prob, path_length)
    counts = np.asarray(info.mask.sum(axis=1))
    np.testing.assert_array_equal(counts, np.asarray(path_length))
    assert np.all(np.asarray(info.ll_forward) <= 0)


def test_reverse_ll_finite():
    key = jax.random.PRNGKey(1)
    log_prob = jax.nn.log_softmax(jax.random.normal(key, (4, 12)), axis=-1)
    info = sample_flip_set(key, log_prob, jnp.full((4,), 3, jnp.int32))
    ll = reverse_ll(log_prob, info)
    assert np.isfinite(np.asarray(ll)).all()


def test_isco_maxcut(small_graphs):
    g = small_graphs["ER_24"]
    opt = milp.solve_maxcut(g, 30.0)
    for mode in ("dense", "sparse"):
        bits, val = solve_maxcut_isco(
            g, ISCOConfig(batch_size=32, chain_length=300), mode=mode
        )
        assert val == obj_maxcut(bits.astype(int), g)
        assert val >= 0.92 * opt.obj, f"{mode}: {val} vs opt {opt.obj}"


def test_isco_mis(small_graphs):
    g = small_graphs["ER_24"]
    bits, size = solve_mis_isco(g, ISCOConfig(batch_size=32, chain_length=300))
    host = obj_maximum_independent_set(bits.astype(int), g)
    assert np.isfinite(host) and host == size
    opt = milp.solve_mis(g, 30.0)
    assert size >= 0.7 * opt.obj


# ------------------------------------------------------------------------ TSP
@pytest.fixture(scope="module")
def tsp_env():
    coords = generate_tsp_coords(1, 20, seed=0)[0]
    dist = tsp_distance_matrix(coords)
    return TSPEnv(dist), dist


def test_tour_length_matches_host(tsp_env):
    env, dist = tsp_env
    key = jax.random.PRNGKey(0)
    tours = env.random_tours(key, 8)
    lens = np.asarray(env.tour_length(tours))
    for b in range(8):
        assert lens[b] == pytest.approx(-obj_tsp(np.asarray(tours[b]), dist), rel=1e-5)


def test_tours_are_permutations(tsp_env):
    env, _ = tsp_env
    tours = env.nearest_neighbor_tours(jax.random.PRNGKey(1), 6)
    for t in np.asarray(tours):
        assert sorted(t.tolist()) == list(range(env.num_cities))


def test_apply_2opt_reverses_segment(tsp_env):
    env, _ = tsp_env
    tours = jnp.arange(20, dtype=jnp.int32)[None, :]
    out = np.asarray(
        TSPEnv.apply_2opt(tours, jnp.asarray([3]), jnp.asarray([8]), jnp.asarray([True]))
    )[0]
    want = list(range(0, 4)) + list(range(8, 3, -1)) + list(range(9, 20))
    assert out.tolist() == want
    # reject leaves unchanged
    out2 = np.asarray(
        TSPEnv.apply_2opt(tours, jnp.asarray([3]), jnp.asarray([8]), jnp.asarray([False]))
    )[0]
    assert out2.tolist() == list(range(20))


def test_2opt_delta_consistency(tsp_env):
    env, _ = tsp_env
    key = jax.random.PRNGKey(2)
    tours = env.random_tours(key, 16)
    lens = env.tour_length(tours)
    lo, hi, delta = env.propose_2opt(key, tours)
    new_tours = TSPEnv.apply_2opt(tours, lo, hi, jnp.ones(16, bool))
    new_lens = env.tour_length(new_tours)
    np.testing.assert_allclose(
        np.asarray(new_lens - lens), np.asarray(delta), atol=1e-3
    )


def test_anneal_improves(tsp_env):
    env, _ = tsp_env
    key = jax.random.PRNGKey(3)
    tours = env.random_tours(key, 32)
    before = float(env.tour_length(tours).min())
    best_t, best_l = jax.jit(lambda k, t: env.anneal(k, t, num_steps=2000))(key, tours)
    after = float(best_l.min())
    assert after < before
    # NN construction + descent should be at least as good as random+anneal
    nn_tours = env.nearest_neighbor_tours(key, 32)
    t2, l2 = jax.jit(lambda k, t: env.two_opt_descent(k, t, num_steps=2000))(key, nn_tours)
    assert float(l2.min()) <= before
    # lengths tracked incrementally must equal recomputation
    np.testing.assert_allclose(
        np.asarray(env.tour_length(t2)), np.asarray(l2), atol=1e-3
    )
