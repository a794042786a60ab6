"""Device cut ops vs host golden objectives; dense vs sparse cross-checks;
flip-gain property tests (the reference's dual-implementation strategy,
SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.ops import cut as cut_ops
from rlsolver_tpu.ops.reductions import pick_xs_by_vs, update_xs_by_vs
from rlsolver_tpu.problems import objectives as obj


@pytest.fixture(scope="module", params=["BA_32", "ER_24", "PL_40"])
def env_case(request, small_graphs):
    g = small_graphs[request.param]
    cg = cut_ops.CutGraph.build(g, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    xs = jax.random.bernoulli(key, 0.5, (16, g.num_nodes))
    return g, cg, xs


def test_dense_matches_host(env_case):
    g, cg, xs = env_case
    vs = np.asarray(cut_ops.cut_dense(xs, cg))
    for b in range(xs.shape[0]):
        want = obj.obj_maxcut(np.asarray(xs[b]).astype(int), g)
        assert vs[b] == pytest.approx(want), f"sim {b}"


def test_sparse_matches_dense(env_case):
    g, cg, xs = env_case
    np.testing.assert_allclose(
        np.asarray(cut_ops.cut_sparse(xs, cg)), np.asarray(cut_ops.cut_dense(xs, cg))
    )


def test_flip_gain_property(env_case):
    """obj(flip(x, i)) - obj(x) == gain[i] for every node."""
    g, cg, xs = env_case
    xs = xs[:4]
    base = np.asarray(cut_ops.cut_dense(xs, cg))
    gains_d = np.asarray(cut_ops.flip_gains_dense(xs, cg))
    gains_s = np.asarray(cut_ops.flip_gains_sparse(xs, cg))
    np.testing.assert_allclose(gains_d, gains_s, atol=1e-4)
    for i in range(g.num_nodes):
        flipped = xs.at[:, i].set(~xs[:, i])
        delta = np.asarray(cut_ops.cut_dense(flipped, cg)) - base
        np.testing.assert_allclose(gains_d[:, i], delta, atol=1e-4)


def test_node_contrib_paths_agree(env_case):
    g, cg, xs = env_case
    c_dense = np.asarray(cut_ops.node_cut_contrib_dense(xs, cg))
    c_sparse = np.asarray(cut_ops.node_cut_contrib_sparse(xs, cg))
    np.testing.assert_allclose(c_dense, c_sparse, atol=1e-4)
    # contribs sum to 2x the cut (each cut edge counted at both endpoints)
    np.testing.assert_allclose(
        c_dense.sum(-1), 2 * np.asarray(cut_ops.cut_dense(xs, cg)), atol=1e-3
    )


def test_apply_flip_update_gains(env_case):
    g, cg, xs = env_case
    xs = xs[:4]
    s = cut_ops.signs_from_bits(xs, jnp.float32)
    gains = cut_ops.flip_gains_dense(xs, cg)
    adj = jnp.asarray(g.adjacency_dense())
    node = 3
    s2, gains2 = cut_ops.apply_flip_update_gains(s, gains, node, adj[node])
    xs2 = xs.at[:, node].set(~xs[:, node])
    np.testing.assert_allclose(
        np.asarray(gains2), np.asarray(cut_ops.flip_gains_dense(xs2, cg)), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(s2), np.asarray(cut_ops.signs_from_bits(xs2, jnp.float32)))


def test_update_xs_by_vs():
    xs_good = jnp.zeros((3, 4), bool)
    vs_good = jnp.array([5.0, 5.0, 5.0])
    xs_new = jnp.ones((3, 4), bool)
    vs_new = jnp.array([6.0, 5.0, 4.0])  # better / tie / worse
    xs, vs = update_xs_by_vs(xs_good, vs_good, xs_new, vs_new)
    np.testing.assert_array_equal(np.asarray(vs), [6.0, 5.0, 5.0])
    assert np.asarray(xs)[0].all() and not np.asarray(xs)[1].any() and not np.asarray(xs)[2].any()


def test_pick_xs_by_vs():
    # 3 repeats x 2 sims; repeat r of sim b at row r*2 + b
    vs = jnp.array([1.0, 9.0, 5.0, 2.0, 3.0, 4.0])
    xs = jnp.arange(6)[:, None].repeat(4, 1)
    best_xs, best_vs = pick_xs_by_vs(xs, vs, num_repeats=3)
    np.testing.assert_array_equal(np.asarray(best_vs), [5.0, 9.0])
    np.testing.assert_array_equal(np.asarray(best_xs)[:, 0], [2, 1])
