"""Flip MDP env + PPO (single-chip and data-parallel over the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.envs.flip_mdp import FlipMdpEnv
from rlsolver_tpu.algos.ppo import (
    MLPActorCritic,
    PPOConfig,
    gae,
    train_ppo,
    train_ppo_sharded,
)
from rlsolver_tpu.parallel.mesh import make_mesh
from rlsolver_tpu.problems.objectives import obj_maxcut


def test_flip_mdp_step_semantics():
    g = graph_from_name("BA_32_ID0")
    env = FlipMdpEnv(g, horizon=4)
    state, obs = env.reset(jax.random.PRNGKey(0), 8)
    assert obs.shape == (8, 32)
    # reward equals the true cut delta of the flipped node
    actions = jnp.arange(8) % 32
    new_state, _, reward, done = jax.jit(env.step)(state, actions)
    for b in range(8):
        before = obj_maxcut(np.asarray(state.xs[b]).astype(int), g)
        after = obj_maxcut(np.asarray(new_state.xs[b]).astype(int), g)
        assert abs((after - before) - float(reward[b])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(new_state.cut), np.asarray(state.cut + reward), atol=1e-5
    )
    assert (np.asarray(done) == 0).all()
    # done fires at the horizon and t wraps
    for _ in range(3):
        new_state, _, _, done = env.step(new_state, actions)
    assert (np.asarray(done) == 1).all()
    assert int(new_state.t) == 0


def test_gae_matches_manual_backward_loop():
    T, B = 5, 3
    key = jax.random.PRNGKey(1)
    r = jax.random.normal(key, (T, B))
    v = jax.random.normal(jax.random.fold_in(key, 1), (T, B))
    d = (jax.random.uniform(jax.random.fold_in(key, 2), (T, B)) < 0.3).astype(
        jnp.float32
    )
    last_v = jax.random.normal(jax.random.fold_in(key, 3), (B,))
    gamma, lam = 0.97, 0.9
    advs = np.asarray(gae(r, v, d, last_v, gamma, lam))

    expected = np.zeros((T, B), np.float32)
    adv_next = np.zeros(B, np.float32)
    value_next = np.asarray(last_v)
    for t in range(T - 1, -1, -1):
        nt = 1.0 - np.asarray(d[t])
        delta = np.asarray(r[t]) + gamma * value_next * nt - np.asarray(v[t])
        adv_next = delta + gamma * lam * nt * adv_next
        expected[t] = adv_next
        value_next = np.asarray(v[t])
    np.testing.assert_allclose(advs, expected, atol=1e-5)


def small_cfg(**kw):
    defaults = dict(
        num_envs=16, horizon=8, num_iterations=12, num_minibatches=2,
        update_epochs=2, lr=3e-3, seed=0,
    )
    defaults.update(kw)
    return PPOConfig(**defaults)


def test_ppo_improves_cut():
    g = graph_from_name("BA_24_ID1")
    state, history = train_ppo(g, small_cfg())
    assert len(history) == 12
    assert np.isfinite([h["loss"] for h in history]).all()
    # mean episode cut should trend upwards vs the random start
    assert history[-1]["mean_cut"] > history[0]["mean_cut"] - 1.0
    assert history[-1]["best_cut"] <= g.total_weight


def test_ppo_warm_start_from_solution_string():
    from rlsolver_tpu.core.encode import SolutionCodec
    from rlsolver_tpu.algos.ppo import MLPActorCritic, init_ppo_state, make_ppo_iteration

    g = graph_from_name("BA_24_ID1")
    # warm start from a greedy solution encoded in base64
    from rlsolver_tpu.classical.greedy import greedy_maxcut

    bits, cut = greedy_maxcut(g)
    s = SolutionCodec(24).bits_to_str(bits.astype(bool))
    cfg = small_cfg(start_str=s)
    env = FlipMdpEnv(g, horizon=cfg.horizon)
    model = MLPActorCritic(24)
    optimizer, _ = make_ppo_iteration(env, model, cfg)
    state = init_ppo_state(env, model, optimizer, cfg, cfg.num_envs)
    # every env starts at the decoded solution with its exact cut value
    np.testing.assert_array_equal(
        np.asarray(state.env_state.xs), np.broadcast_to(bits, (cfg.num_envs, 24))
    )
    np.testing.assert_allclose(np.asarray(state.env_state.cut), cut)


def test_mcpg_gset_presets():
    from rlsolver_tpu.algos.mcpg import GSET_PRESETS, preset_for

    assert preset_for("data/gset/gset_22.txt").total_mcmc_num == 2048
    assert preset_for("gset_70").reset_epoch_num == 320
    assert preset_for("BA_100_ID0").total_mcmc_num == 256  # default
    assert set(GSET_PRESETS) == {"gset_14", "gset_22", "gset_55", "gset_70"}


def test_ppo_sharded_runs_and_aggregates():
    g = graph_from_name("BA_24_ID1")
    mesh = make_mesh(8)
    state, history = train_ppo_sharded(g, mesh, small_cfg(num_envs=32))
    assert len(history) == 12
    assert np.isfinite([h["loss"] for h in history]).all()
    assert history[-1]["best_cut"] <= g.total_weight
    # envs stayed sharded: leading axis is the global batch
    assert state.env_state.xs.shape == (32, 24)
