"""Multi-agent agents: VDN, QMIX, MAPPO, MADDPG on a cooperative toy env."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.algos.multi_agent import (
    MaddpgAgent,
    MaddpgConfig,
    MappoAgent,
    MappoConfig,
    MixConfig,
    ValueMixAgent,
)


# cooperative discrete env: n agents on a line, joint reward = -sum|pos - goal|
N_AGENTS, OBS, ACTIONS = 3, 4, 3  # actions: left/stay/right


def coop_reset(key, batch):
    pos = jax.random.randint(key, (batch, N_AGENTS), -3, 4).astype(jnp.float32)
    goal = jnp.arange(N_AGENTS, dtype=jnp.float32)[None, :].repeat(batch, 0)
    return pos, goal


def coop_obs(pos, goal):
    b = pos.shape[0]
    own = jnp.stack([pos, goal, goal - pos, jnp.abs(goal - pos)], axis=-1)
    return own  # [B, n, 4]


def coop_state(pos, goal):
    return jnp.concatenate([pos, goal, goal - pos], axis=1)  # [B, 3n]


def coop_step(pos, goal, actions):
    delta = actions.astype(jnp.float32) - 1.0
    pos = pos + delta
    reward = -jnp.abs(pos - goal).sum(axis=1)
    return pos, reward


def collect(key, agent_act, steps=40, batch=64):
    k_r, key = jax.random.split(key)
    pos, goal = coop_reset(k_r, batch)
    data = []
    for _ in range(steps):
        key, k_a = jax.random.split(key)
        obs = coop_obs(pos, goal)
        actions = agent_act(obs, k_a)
        new_pos, reward = coop_step(pos, goal, actions)
        data.append(
            (obs, actions, reward, coop_obs(new_pos, goal),
             coop_state(pos, goal), coop_state(new_pos, goal))
        )
        pos = new_pos
    return data


def eval_greedy(agent, st, key, steps=8):
    pos, goal = coop_reset(key, 32)
    total = 0.0
    for _ in range(steps):
        actions = agent.act(st, coop_obs(pos, goal), key, epsilon=0.0)
        pos, r = coop_step(pos, goal, actions)
        total += float(r.mean())
    return total / steps


@pytest.mark.parametrize("mixer", ["sum", "qmix"])
def test_value_mix_agents_learn(mixer):
    cfg = MixConfig(
        n_agents=N_AGENTS, obs_dim=OBS, state_dim=3 * N_AGENTS,
        num_actions=ACTIONS, lr=2e-3,
    )
    agent = ValueMixAgent(mixer, cfg)
    st = agent.init()
    update = agent.make_update()
    key = jax.random.PRNGKey(0)
    before = eval_greedy(agent, st, jax.random.PRNGKey(5))

    # fresh epsilon-greedy data each epoch (a static off-policy dataset +
    # max-operator bootstrapping diverges — the deadly triad)
    for epoch in range(6):
        key, k_c = jax.random.split(key)
        st_now = st
        data = collect(
            k_c, lambda obs, k: agent.act(st_now, obs, k, epsilon=0.3), steps=20
        )
        for _ in range(3):
            for obs, actions, reward, next_obs, sg, nsg in data:
                # done=1: one-step episodes (the env is non-terminating, so
                # bootstrapped targets would have to learn a -r/(1-gamma)
                # offset first — far too slow for a unit test)
                st, loss = update(
                    st, obs, actions, reward, next_obs, jnp.ones(obs.shape[0]), sg, nsg
                )
    assert np.isfinite(float(loss))
    after = eval_greedy(agent, st, jax.random.PRNGKey(5))
    assert after > before  # moves toward the goals


def test_mappo_update_improves_objective():
    cfg = MappoConfig(
        n_agents=N_AGENTS, obs_dim=OBS, state_dim=3 * N_AGENTS,
        num_actions=ACTIONS, lr=1e-3,
    )
    agent = MappoAgent(cfg)
    st = agent.init()
    update = agent.make_update()
    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(30):
        key, k_r, k_a = jax.random.split(key, 3)
        pos, goal = coop_reset(k_r, 128)
        obs = coop_obs(pos, goal)
        sg = coop_state(pos, goal)
        actions, logp = agent.act(st, obs, k_a)
        _, reward = coop_step(pos, goal, actions)
        v = agent.value(st, sg)
        adv = reward - v
        returns = reward
        st, metrics = update(st, obs, actions, logp, adv, returns, sg)
        losses.append(float(metrics["critic_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])  # critic fits reward


def test_maddpg_update_runs_and_critic_fits():
    cfg = MaddpgConfig(n_agents=2, obs_dim=3, act_dim=1, lr=1e-3)
    agent = MaddpgAgent(cfg)
    st = agent.init()
    update = agent.make_update()
    key = jax.random.PRNGKey(2)
    losses = []
    for it in range(60):
        key, k1, k2 = jax.random.split(key, 3)
        obs = jax.random.normal(k1, (64, 2, 3))
        act = jnp.clip(jax.random.normal(k2, (64, 2, 1)), -1, 1)
        # reward: each agent wants action = its first obs component
        reward = -jnp.abs(act[..., 0] - obs[..., 0])
        next_obs = obs
        st, metrics = update(st, obs, act, reward, next_obs, jnp.ones(64))
        losses.append(float(metrics["critic_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # learned actor should track obs[...,0]
    test_obs = jnp.zeros((8, 2, 3)).at[..., 0].set(0.5)
    act = agent.act(st, test_obs)
    assert float(jnp.abs(act[..., 0] - 0.5).mean()) < 0.45
