"""Flagship solvers through the unified runtime (`train/runner.py`).

The round-1 gap: TrainLoop existed but no algorithm used it. These tests
drive MCPG / L2A / DQN through it and verify the runtime capabilities for
real — kill-and-resume reproduces the uninterrupted run bit-for-bit
(reference capability: `elegantrl/train/run.py:130`, `AgentBase.py:280-299`).
"""

import json
import os

import numpy as np
import pytest

from rlsolver_tpu.algos.mcpg import MCPGConfig, solve_maxcut_mcpg_runner
from rlsolver_tpu.core.generate import graph_from_name

GRAPH = graph_from_name("BA_32_ID0")
CFG = MCPGConfig(
    total_mcmc_num=16,
    repeat_times=4,
    num_ls=2,
    max_epoch_num=2,
    reset_epoch_num=12,
    sample_epoch_num=4,
    warmup_ls_rounds=1,
    seed=3,
)


def _metrics(run_dir):
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


def test_mcpg_kill_and_resume_reproduces_run(tmp_path):
    # uninterrupted 6-round run
    full_dir = str(tmp_path / "full")
    bx_full, bv_full, state_full = solve_maxcut_mcpg_runner(
        GRAPH, CFG, run_dir=full_dir, total_rounds=6, checkpoint_every=2
    )
    # interrupted at round 3, then resumed to 6
    part_dir = str(tmp_path / "part")
    solve_maxcut_mcpg_runner(
        GRAPH, CFG, run_dir=part_dir, total_rounds=3, checkpoint_every=2
    )
    bx_res, bv_res, state_res = solve_maxcut_mcpg_runner(
        GRAPH, CFG, run_dir=part_dir, total_rounds=6, checkpoint_every=2,
        resume=True,
    )
    assert bv_res == bv_full
    np.testing.assert_array_equal(bx_res, bx_full)
    np.testing.assert_array_equal(
        np.asarray(state_res.best_vs), np.asarray(state_full.best_vs)
    )
    # metrics stream exists and best_cut is monotone
    rows = _metrics(full_dir)
    best = [r["best_cut"] for r in rows]
    assert best == sorted(best)


def test_mcpg_stop_sentinel(tmp_path):
    run_dir = tmp_path / "stopped"
    run_dir.mkdir()
    (run_dir / "stop").write_text("")
    _, _, state = solve_maxcut_mcpg_runner(
        GRAPH, CFG, run_dir=str(run_dir), total_rounds=50
    )
    assert int(state.round_idx) <= 1  # stopped after the first step


def test_l2a_runner_improves_and_logs(tmp_path):
    from rlsolver_tpu.algos.l2a import L2AConfig, solve_maxcut_l2a_runner

    cfg = L2AConfig(
        num_sims=16, num_repeats=2, top_k=4, num_searchers=1, seq_len=3,
        num_iters=4, embed_dim=16, num_heads=2, pretrain_steps=10,
        update_times=2, ls_iters=2, ls_num_spin=2, seed=0,
    )
    run_dir = str(tmp_path / "l2a")
    bx, bv, state = solve_maxcut_l2a_runner(GRAPH, cfg, run_dir=run_dir)
    from rlsolver_tpu.problems.objectives import obj_maxcut

    assert bv == pytest.approx(obj_maxcut(bx, GRAPH))
    rows = _metrics(run_dir)
    assert len(rows) == 4 and "ppo_loss" in rows[0]


def test_dqn_runner_smoke_and_resume(tmp_path):
    from rlsolver_tpu.algos.dqn import DQNAgent, DQNConfig
    from rlsolver_tpu.envs.spin_system import SpinSystemConfig, SpinSystemEnv

    env = SpinSystemEnv(16, SpinSystemConfig(num_envs=4, max_steps=8))
    cfg = DQNConfig(
        buffer_capacity=256, batch_size=8, learning_starts=16,
        update_frequency=2, target_update_frequency=8, eps_decay_steps=64,
        features=8, n_layers=1, seed=0,
    )
    agent = DQNAgent(env, cfg)
    g = graph_from_name("BA_16_ID1")
    run_dir = str(tmp_path / "dqn")
    params_full, state_full = agent.train_runner(
        g, num_steps=24, run_dir=run_dir + "_full", checkpoint_every=8
    )
    agent.train_runner(g, num_steps=12, run_dir=run_dir, checkpoint_every=8)
    params_res, state_res = agent.train_runner(
        g, num_steps=24, run_dir=run_dir, checkpoint_every=8, resume=True
    )
    assert int(state_res.step_idx) == 24
    # resumed run reproduces the uninterrupted one exactly
    assert float(state_res.best_cut) == float(state_full.best_cut)
    a = jax_flat(params_res)
    b = jax_flat(params_full)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=0, atol=0)


def jax_flat(tree):
    import jax

    return [np.asarray(x) for x in jax.tree.leaves(tree)]
