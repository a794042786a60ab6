"""L2A/dREINFORCE components and end-to-end smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.algos.l2a import L2AConfig, pretrain_graph_encoder, solve_maxcut_l2a
from rlsolver_tpu.models.transformer import (
    GraphEncoder,
    PolicyTrsWithValue,
    solution_to_prob_channels,
)
from rlsolver_tpu.ops.sampling import sub_set_sampling
from rlsolver_tpu.problems.objectives import obj_maxcut


def test_solution_to_prob_channels():
    xs = jnp.asarray([[True, False]])
    ch = np.asarray(solution_to_prob_channels(xs))
    np.testing.assert_array_equal(ch[0], [[1, -1], [-1, 1]])


def test_sub_set_sampling_only_touches_uncertain_bits():
    key = jax.random.PRNGKey(0)
    probs = jnp.asarray([[0.9, 0.5, 0.1, 0.52, 0.02, 0.98]])
    start = jnp.asarray([[True, True, True, True, True, True]])
    out = np.asarray(sub_set_sampling(key, probs, start, num_repeats=4, top_k=2))
    assert out.shape == (4, 6)
    # certain bits (0, 2, 4, 5) keep the incumbent values
    for col in (0, 2, 4, 5):
        assert (out[:, col] == True).all()


def test_sub_set_sampling_respects_probs():
    key = jax.random.PRNGKey(1)
    probs = jnp.asarray([[0.47, 0.99, 0.01, 0.99]])  # bit 0 is the uncertain one
    start = jnp.zeros((1, 4), bool)
    out = np.asarray(sub_set_sampling(key, probs, start, num_repeats=2000, top_k=1))
    freq = out[:, 0].mean()
    assert 0.4 < freq < 0.55  # ~0.47


def test_graph_encoder_pretrain_reduces_loss(small_graphs):
    g = small_graphs["BA_32"]
    cfg = L2AConfig(embed_dim=32, num_heads=4, pretrain_steps=60)
    key = jax.random.PRNGKey(0)
    enc, params, seq_graph = pretrain_graph_encoder(g, cfg, key)
    assert seq_graph.shape == (32, 32)
    # embedding should reconstruct adjacency far better than chance
    adj = jnp.asarray(g.adjacency_dense(), jnp.float32)
    recon, _ = enc.apply(params, adj[None])
    pred = np.asarray(recon[0]) > 0
    truth = np.asarray(adj) > 0
    acc = (pred == truth).mean()
    assert acc > 0.8, f"reconstruction accuracy {acc}"


def test_policy_trs_shapes():
    net = PolicyTrsWithValue(embed_dim=32, num_heads=4)
    xs = jnp.zeros((5, 12), bool)
    seq_graph = jnp.ones((12, 32))
    params = net.init(jax.random.PRNGKey(0), solution_to_prob_channels(xs), seq_graph)
    logits, value = net.apply(params, solution_to_prob_channels(xs), seq_graph)
    assert logits.shape == (5, 12, 2)
    assert value.shape == (5,)


def test_l2a_end_to_end(small_graphs):
    g = small_graphs["BA_32"]
    cfg = L2AConfig(
        num_sims=16,
        num_repeats=4,
        top_k=8,
        num_searchers=1,
        seq_len=4,
        num_iters=2,
        embed_dim=32,
        pretrain_steps=30,
        update_times=4,
        ls_iters=2,
    )
    best_x, best_v, ev = solve_maxcut_l2a(g, cfg)
    assert best_v == obj_maxcut(best_x.astype(int), g)
    # must reach at least the 1-flip local optimum regime
    from rlsolver_tpu.envs.maxcut import MaxcutEnv

    gains = np.asarray(MaxcutEnv(g).gains(jnp.asarray(best_x[None])))
    assert (gains <= 1e-6).all()
