"""BLS maxcut, prioritized replay, and the A2C variant."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.classical.bls import BLSConfig, solve_maxcut_bls
from rlsolver_tpu.classical.greedy import greedy_maxcut
from rlsolver_tpu.problems.objectives import obj_maxcut
from rlsolver_tpu.train.replay import (
    PrioritizedReplay,
    per_add,
    per_sample,
    per_update,
)
from rlsolver_tpu.algos.ppo import PPOConfig, train_a2c


def test_bls_beats_greedy():
    g = graph_from_name("BA_48_ID0")
    bits, cut, history = solve_maxcut_bls(
        g, BLSConfig(num_chains=64, num_rounds=20, seed=0)
    )
    assert cut == obj_maxcut(bits.astype(int), g)
    _, greedy_cut = greedy_maxcut(g)
    assert cut >= greedy_cut
    # best-so-far history is monotone
    assert all(history[i + 1] >= history[i] - 1e-6 for i in range(len(history) - 1))


def test_bls_reaches_proved_optimum_ba100():
    # BA_100_ID0's optimum is 282 (MILP bound == primal in the committed
    # distribution-wise table, results_quality/dist_table.csv) — the tabu
    # engine must reach it within a small budget.
    g = graph_from_name("BA_100_ID0")
    bits, cut, _ = solve_maxcut_bls(
        g, BLSConfig(num_chains=128, num_rounds=10, steps_per_round=512,
                     seed=3)
    )
    assert cut == obj_maxcut(bits.astype(int), g)
    assert cut >= 282.0


def test_per_sampling_prefers_high_priority():
    example = (jnp.zeros(3), jnp.float32(0))
    buf = PrioritizedReplay.create(example, capacity=32)
    for i in range(32):
        buf = per_add(buf, (jnp.full(3, float(i)), jnp.float32(i)))
    # set one huge priority
    buf = per_update(buf, jnp.asarray([7]), jnp.asarray([100.0]))
    buf = per_update(buf, jnp.asarray(list(range(0, 7)) + list(range(8, 32))),
                     jnp.full(31, 0.01))
    _, idx, w = per_sample(buf, jax.random.PRNGKey(0), 256, beta=0.4)
    counts = np.bincount(np.asarray(idx), minlength=32)
    assert counts[7] > 128  # dominant priority dominates samples
    # importance weights: rare samples get weight 1 (max), frequent less
    assert float(w.max()) == 1.0
    w7 = np.asarray(w)[np.asarray(idx) == 7]
    assert (w7 < 1.0).all()


def test_per_empty_slots_never_sampled():
    example = (jnp.zeros(2), jnp.float32(0))
    buf = PrioritizedReplay.create(example, capacity=16)
    for i in range(4):
        buf = per_add(buf, (jnp.full(2, float(i + 1)), jnp.float32(1)))
    batch, idx, _ = per_sample(buf, jax.random.PRNGKey(1), 64)
    assert (np.asarray(idx) < 4).all()
    assert (np.asarray(batch[0])[:, 0] >= 1).all()


def test_a2c_trains():
    g = graph_from_name("BA_24_ID1")
    cfg = PPOConfig(num_envs=16, horizon=8, num_iterations=10, lr=3e-3)
    state, history = train_a2c(g, cfg)
    assert len(history) == 10
    assert np.isfinite([h["loss"] for h in history]).all()
