"""Jumanji-parity A2C/PPO on the vectorized SpinSystemEnv
(`algos/jumanji_ppo.py` vs reference `jumanji/agents/AgentPPO.py:10-231`)."""

import numpy as np
import pytest

from rlsolver_tpu.algos.jumanji_ppo import (
    SpinPPOConfig,
    evaluate_spin_policy,
    train_spin_ppo,
)
from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.envs.spin_system import SpinSystemConfig, SpinSystemEnv


def make_env(n, num_envs=8, max_steps=24):
    return SpinSystemEnv(
        n,
        SpinSystemConfig(num_envs=num_envs, max_steps=max_steps),
    )


def test_ppo_beats_random_on_ba64():
    """The VERDICT acceptance test: trained PPO cut > epsilon-greedy-random
    on BA_64."""
    g = graph_from_name("BA_64_ID0")
    env = make_env(64, num_envs=8, max_steps=48)
    # 60 iters: under per-episode observation scaling (round-4 spin_system
    # change) the 30-iter margin at this micro-budget was within noise;
    # at 60 the trained policy clears random by ~25% (171 vs 137)
    cfg = SpinPPOConfig(num_iters=60, features=16, n_layers=2, seed=0)
    params, history = train_spin_ppo(env, g, cfg)
    random_cut = np.mean(
        [evaluate_spin_policy(env, g, seed=s) for s in range(3)]
    )
    trained_cut = np.mean(
        [
            evaluate_spin_policy(env, g, params=params, cfg=cfg, seed=s)
            for s in range(3)
        ]
    )
    assert trained_cut > random_cut


def test_a2c_trains_and_improves():
    g = graph_from_name("BA_24_ID1")
    env = make_env(24, num_envs=8, max_steps=16)
    cfg = SpinPPOConfig(algo="a2c", num_iters=20, features=16, n_layers=1, seed=1)
    params, history = train_spin_ppo(env, g, cfg)
    assert len(history["best_cut"]) == 20
    # later iterations find at least as good cuts as the first, on average
    assert np.mean(history["best_cut"][-5:]) >= np.mean(history["best_cut"][:5])


def test_rollout_uses_bls_rewards_and_masks():
    """Structural check: training runs under BLS + basin shaping and the
    policy never picks a disallowed action (masked logits)."""
    from rlsolver_tpu.envs.spin_system import RewardSignal

    g = graph_from_name("ER_16_ID0")
    env = SpinSystemEnv(
        16,
        SpinSystemConfig(
            num_envs=4,
            max_steps=12,
            reward_signal=RewardSignal.BLS,
            basin_reward=1.0 / 16,
            stag_punishment=0.01,
        ),
    )
    cfg = SpinPPOConfig(num_iters=3, features=8, n_layers=1, seed=2)
    params, history = train_spin_ppo(env, g, cfg)
    assert np.isfinite(history["loss"]).all()
