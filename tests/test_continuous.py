"""DDPG/TD3/SAC off-policy agents on a point-chasing env (the ElegantRL
demo-env pattern: `elegantrl/envs/PointChasingEnv`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.algos.continuous import (
    OffPolicyAgent,
    OffPolicyConfig,
    Replay,
    Transition,
    replay_add,
    replay_sample,
    soft_update,
)


def point_env_step(obs, action, dt=0.2):
    """obs = [pos(2), target(2)]; action = velocity; reward = -dist."""
    pos = obs[..., :2] + action * dt
    target = obs[..., 2:]
    reward = -jnp.linalg.norm(pos - target, axis=-1)
    return jnp.concatenate([pos, target], axis=-1), reward


def rollout_policy(agent, state, key, steps=20):
    k_reset, key = jax.random.split(key)
    obs = jax.random.uniform(k_reset, (16, 4), minval=-1, maxval=1)
    total = 0.0
    for _ in range(steps):
        act = agent.act(state, obs)
        obs, r = point_env_step(obs, act)
        total += float(r.mean())
    return total / steps


def test_replay_ring_buffer():
    buf = Replay.create(4, 3, 2)
    for i in range(6):
        tr = Transition(
            jnp.full((3,), float(i)), jnp.zeros(2), jnp.float32(i),
            jnp.zeros(3), jnp.float32(0),
        )
        buf = replay_add(buf, tr)
    assert int(buf.size) == 4
    assert int(buf.ptr) == 2
    # oldest entries overwritten: rewards present are {2,3,4,5}
    assert set(np.asarray(buf.data.reward).tolist()) == {2.0, 3.0, 4.0, 5.0}
    batch = replay_sample(buf, jax.random.PRNGKey(0), 8)
    assert batch.obs.shape == (8, 3)


def test_soft_update():
    t = {"w": jnp.zeros(3)}
    o = {"w": jnp.ones(3)}
    out = soft_update(t, o, 0.1)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1)


@pytest.mark.parametrize("algo", ["ddpg", "td3", "sac"])
def test_agent_learns_point_chasing(algo):
    cfg = OffPolicyConfig(obs_dim=4, act_dim=2, max_action=1.0, lr=1e-3, batch=64)
    agent = OffPolicyAgent(algo, cfg)
    state = agent.init()
    update = agent.make_update()
    buf = Replay.create(5000, 4, 2)
    key = jax.random.PRNGKey(0)

    reward_before = rollout_policy(agent, state, jax.random.PRNGKey(99))

    # fill buffer with random-policy transitions
    obs = jax.random.uniform(key, (64, 4), minval=-1, maxval=1)
    for t in range(60):
        key, k_a = jax.random.split(key)
        act = jax.random.uniform(k_a, (64, 2), minval=-1, maxval=1)
        next_obs, r = point_env_step(obs, act)
        for b in range(0, 64, 8):  # subsample to keep the python loop short
            buf = replay_add(
                buf,
                Transition(obs[b], act[b], r[b], next_obs[b], jnp.float32(0.0)),
            )
        obs = next_obs

    for t in range(300):
        key, k_s, k_u = jax.random.split(key, 3)
        batch = replay_sample(buf, k_s, cfg.batch)
        state, metrics = update(state, batch, k_u)
    assert np.isfinite(float(metrics["critic_loss"]))

    reward_after = rollout_policy(agent, state, jax.random.PRNGKey(99))
    assert reward_after > reward_before  # moves toward the target


def test_embed_dqn_learns_contextual_bandit():
    """EmbedDQN (`AgentEmbedDQN` parity) learns argmax-of-obs on a one-step
    contextual bandit: greedy accuracy must be near-perfect."""
    import jax
    import jax.numpy as jnp

    from rlsolver_tpu.algos.continuous import (
        EmbedDQNAgent,
        EmbedDQNConfig,
        Replay,
        Transition,
        replay_add,
        replay_sample,
    )

    cfg = EmbedDQNConfig(obs_dim=4, action_dim=4, lr=3e-3, batch=64, tau=0.05, seed=0)
    agent = EmbedDQNAgent(cfg)
    state = agent.init()
    update = agent.make_update()
    buf = Replay.create(cfg.capacity, cfg.obs_dim, 1)
    key = jax.random.PRNGKey(1)

    # fill buffer with random transitions (done=1: bandit)
    for i in range(40):
        key, k1, k2 = jax.random.split(key, 3)
        obs = jax.random.uniform(k1, (16, cfg.obs_dim))
        acts = jax.random.randint(k2, (16,), 0, cfg.action_dim)
        rew = (acts == jnp.argmax(obs, axis=1)).astype(jnp.float32)
        for j in range(16):
            buf = replay_add(
                buf,
                Transition(obs[j], acts[j, None].astype(jnp.float32), rew[j],
                           obs[j], jnp.float32(1.0)),
            )
    for i in range(400):
        key, k = jax.random.split(key)
        state, loss = update(state, replay_sample(buf, k, cfg.batch))
    key, k_eval = jax.random.split(key)
    obs = jax.random.uniform(k_eval, (256, cfg.obs_dim))
    greedy = agent.act(state, obs, key, explore=False)
    acc = float((greedy == jnp.argmax(obs, axis=1)).mean())
    assert acc > 0.9, acc
