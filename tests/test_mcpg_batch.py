"""Batched multi-instance MCPG (`algos/mcpg_batch.py`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.algos.mcpg import MCPGConfig
from rlsolver_tpu.algos.mcpg_batch import (
    StackedGraphs,
    cut_values_stacked,
    solve_maxcut_mcpg_batched,
)
from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.problems.objectives import obj_maxcut

GRAPHS = [graph_from_name(f"BA_24_ID{i}") for i in range(3)]


def test_cut_values_stacked_matches_oracle():
    sg = StackedGraphs.build(GRAPHS)
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 2, size=(len(GRAPHS), 5, 24)).astype(bool)
    vs = np.asarray(cut_values_stacked(jnp.asarray(xs), sg))
    for g in range(len(GRAPHS)):
        for b in range(5):
            assert vs[g, b] == pytest.approx(obj_maxcut(xs[g, b], GRAPHS[g]))


def test_batched_mcpg_solves_and_rescoring_matches():
    cfg = MCPGConfig(
        total_mcmc_num=32,
        repeat_times=4,
        num_ls=2,
        max_epoch_num=2,
        reset_epoch_num=8,
        sample_epoch_num=4,
        warmup_ls_rounds=1,
    )
    best_x, best_v, history = solve_maxcut_mcpg_batched(GRAPHS, cfg)
    assert best_x.shape == (len(GRAPHS), 24)
    for g, graph in enumerate(GRAPHS):
        # returned value is the true cut of the returned solution
        assert best_v[g] == pytest.approx(obj_maxcut(best_x[g], graph))
        # sanity: beats a random solution on average (tiny run, loose bar)
        assert best_v[g] >= 0.5 * graph.total_weight
    assert len(history) == 2
    assert np.all(history[1]["best"] >= history[0]["best"])  # monotone incumbents
