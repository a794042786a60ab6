"""Pattern-II MaxcutEnv tests: random init, local search invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.envs.maxcut import MaxcutEnv
from rlsolver_tpu.problems import objectives as obj


@pytest.fixture(scope="module")
def env(small_graphs):
    return MaxcutEnv(small_graphs["BA_32"])


def test_random_xs_pins_node0(env):
    xs = env.random_xs(jax.random.PRNGKey(1), 64)
    assert xs.shape == (64, env.num_nodes)
    assert not np.asarray(xs[:, 0]).any()


def test_obj_matches_host(env):
    xs = env.random_xs(jax.random.PRNGKey(2), 8)
    vs = np.asarray(env.obj(xs))
    for b in range(8):
        assert vs[b] == obj.obj_maxcut(np.asarray(xs[b]).astype(int), env.graph)


def test_sweep_1flip_reaches_local_optimum(env):
    xs = env.random_xs(jax.random.PRNGKey(3), 16)
    vs = env.obj(xs)
    xs2, vs2 = env.sweep_1flip(xs, vs)
    # reported values match recomputed objective
    np.testing.assert_allclose(np.asarray(env.obj(xs2)), np.asarray(vs2), atol=1e-4)
    # monotone improvement
    assert (np.asarray(vs2) >= np.asarray(vs)).all()
    # after one full strict-improvement sweep, re-sweeping can still improve,
    # but gains of a converged sweep fixpoint must be <= 0 eventually
    for _ in range(6):
        xs2, vs2 = env.sweep_1flip(xs2, vs2)
    gains = np.asarray(env.gains(xs2))
    assert (gains <= 1e-4).all(), "not a 1-flip local optimum"


def test_local_search_improves_and_is_consistent(env):
    key = jax.random.PRNGKey(4)
    xs = env.random_xs(key, 32)
    vs = env.obj(xs)
    xs2, vs2 = jax.jit(env.local_search)(key, xs, vs)
    np.testing.assert_allclose(np.asarray(env.obj(xs2)), np.asarray(vs2), atol=1e-4)
    assert (np.asarray(vs2) >= np.asarray(vs)).all()
    assert np.asarray(vs2).max() > np.asarray(vs).max()


def test_local_search_jits_once(env):
    # same shapes -> no retrace errors, runs under jit with key threading
    f = jax.jit(lambda k, xs: env.local_search(k, xs))
    key = jax.random.PRNGKey(5)
    xs = env.random_xs(key, 8)
    out1 = f(key, xs)
    out2 = f(jax.random.PRNGKey(6), xs)
    assert out1[0].shape == out2[0].shape
