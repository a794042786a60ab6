"""seq2seq REINFORCE solver and k_spin L2O-LSTM solver."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.algos.l2o import (
    L2OConfig,
    Seq2SeqConfig,
    expected_cut,
    solve_maxcut_l2o,
    solve_maxcut_seq2seq,
)
from rlsolver_tpu.problems.objectives import obj_maxcut


def test_expected_cut_matches_hard_assignments():
    g = graph_from_name("BA_16_ID0")
    adj = jnp.asarray(g.adjacency_dense())
    rng = np.random.RandomState(0)
    bits = rng.rand(5, 16) < 0.5
    ec = np.asarray(expected_cut(jnp.asarray(bits, jnp.float32), adj))
    for b in range(5):
        assert abs(ec[b] - obj_maxcut(bits[b].astype(int), g)) < 1e-3


def test_expected_cut_half_probs():
    g = graph_from_name("ER_12_ID0")
    adj = jnp.asarray(g.adjacency_dense())
    ec = float(expected_cut(jnp.full((1, 12), 0.5), adj)[0])
    assert abs(ec - 0.5 * g.total_weight) < 1e-3


def test_seq2seq_solver():
    g = graph_from_name("BA_20_ID0")
    bits, cut, history = solve_maxcut_seq2seq(
        g, Seq2SeqConfig(num_envs=32, num_steps=40, hidden=64, lr=1e-3)
    )
    assert cut == obj_maxcut(bits.astype(int), g)
    assert cut > 0.5 * g.total_weight


def test_l2o_solver():
    g = graph_from_name("BA_20_ID0")
    bits, cut, history = solve_maxcut_l2o(
        g,
        L2OConfig(num_envs=32, episode_length=8, num_epochs=30, hidden=64, lr=1e-3),
    )
    assert cut == obj_maxcut(bits.astype(int), g)
    assert cut > 0.5 * g.total_weight
    # direct-backprop objective should improve over epochs
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0]
