"""Graph-generator family (`envs/generators.py`) — the ECO-DQN
train/validate/select protocol pieces (`util_envs.py:62-353`)."""

import numpy as np
import pytest

from rlsolver_tpu.config import GraphType
from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.envs.generators import (
    PerturbedGraphGenerator,
    RandomGraphGenerator,
    SetGraphGenerator,
    SingleGraphGenerator,
    ValidationGraphGenerator,
)


def test_random_generator_is_seeded_and_fresh():
    g1 = RandomGraphGenerator(GraphType.BA, 24, seed=5)
    g2 = RandomGraphGenerator(GraphType.BA, 24, seed=5)
    a, b = g1.get(), g1.get()
    # fresh instances differ, same-seed streams agree
    assert not np.array_equal(a.adjacency_dense(), b.adjacency_dense())
    assert np.array_equal(g2.get().adjacency_dense(), a.adjacency_dense())


def test_validation_generator_fixed_set():
    v1 = ValidationGraphGenerator(GraphType.ER, 20, num_graphs=4)
    v2 = ValidationGraphGenerator(GraphType.ER, 20, num_graphs=4)
    for a, b in zip(v1.get(), v2.get()):
        assert np.array_equal(a.adjacency_dense(), b.adjacency_dense())
    # distinct instances within the set
    adjs = [g.adjacency_dense() for g in v1.get()]
    assert not np.array_equal(adjs[0], adjs[1])


def test_set_generator_ordered_cycles():
    graphs = [graph_from_name(f"BA_16_ID{i}") for i in range(3)]
    gen = SetGraphGenerator(graphs, ordered=True)
    seq = [gen.get().name for _ in range(6)]
    assert seq == [g.name for g in graphs] * 2


def test_perturbed_generator_preserves_topology():
    base = graph_from_name("BA_24_ID0")
    gen = PerturbedGraphGenerator([base], perturb_std=0.05, seed=1)
    pert = gen.get()
    a0 = base.adjacency_dense()
    a1 = pert.adjacency_dense()
    # same sparsity pattern, symmetric, weights perturbed but near 1
    assert np.array_equal(a0 != 0, a1 != 0)
    assert np.allclose(a1, a1.T)
    w = a1[a0 != 0]
    assert np.all(np.abs(w - 1.0) < 0.5)
    assert np.std(w) > 0  # actually perturbed


def test_dqn_select_best_checkpoint():
    """select_best returns the params of the best validation score."""
    from rlsolver_tpu.algos.dqn import DQNAgent, DQNConfig
    from rlsolver_tpu.envs.spin_system import SpinSystemConfig, SpinSystemEnv

    env = SpinSystemEnv(16, SpinSystemConfig(num_envs=4, max_steps=8))
    agent = DQNAgent(
        env,
        DQNConfig(
            buffer_capacity=256, batch_size=8, learning_starts=16,
            update_frequency=2, eps_decay_steps=64, features=8, n_layers=1,
        ),
    )
    val = ValidationGraphGenerator(GraphType.BA, 16, num_graphs=2).get()
    sampler = SingleGraphGenerator(graph_from_name("BA_16_ID0"))
    params, history = agent.train(
        sampler, num_steps=40, eval_every=16, eval_graphs=val, select_best=True
    )
    assert history["eval"]
    returned_score = np.mean([agent.evaluate(params, g) for g in val])
    assert returned_score >= max(s for _, s in history["eval"]) - 1e-6
