"""Demo continuous envs: point chasing and stock trading."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.envs.demo import PointChasingEnv, StockTradingEnv


def test_point_chasing_reward_and_horizon():
    env = PointChasingEnv(horizon=4)
    state, obs = env.reset(jax.random.PRNGKey(0), 8)
    assert obs.shape == (8, 6)
    key = jax.random.PRNGKey(1)
    # moving straight toward the target beats standing still
    toward = (state.target - state.chaser)
    toward = toward / (jnp.linalg.norm(toward, axis=-1, keepdims=True) + 1e-6)
    _, _, r_move, done = jax.jit(env.step)(key, state, toward)
    _, _, r_still, _ = jax.jit(env.step)(key, state, jnp.zeros((8, 2)))
    assert float(r_move.mean()) > float(r_still.mean())
    assert (np.asarray(done) == 0).all()
    s = state
    for _ in range(4):
        s, _, _, done = env.step(key, s, jnp.zeros((8, 2)))
    assert (np.asarray(done) == 1).all()


def test_stock_trading_accounting():
    env = StockTradingEnv.random_walk(10, 3, seed=0)
    state, obs = env.reset(4)
    assert obs.shape == (4, env.obs_dim)
    a0 = env.assets(state)
    np.testing.assert_allclose(np.asarray(a0), env.initial_cash)
    # buy everything possible, then total assets change only through prices
    state2, _, reward, _ = jax.jit(env.step)(state, jnp.ones((4, 3)))
    assert (np.asarray(state2.cash) >= -1e-3).all()
    assert (np.asarray(state2.shares) >= 0).all()
    # reward equals the asset delta across the day boundary
    a1 = env.assets(state2)
    np.testing.assert_allclose(np.asarray(reward), np.asarray(a1 - a0), atol=1e-2)


def test_stock_trading_cannot_sell_short_or_overspend():
    env = StockTradingEnv.random_walk(5, 2, seed=1)
    state, _ = env.reset(2)
    # try to sell with zero shares
    state2, _, _, _ = env.step(state, -jnp.ones((2, 2)))
    assert (np.asarray(state2.shares) >= -1e-6).all()
    # spend more than cash: scaled down, cash stays non-negative
    rich_state = state._replace(cash=jnp.full((2,), 10.0))
    state3, _, _, _ = env.step(rich_state, jnp.ones((2, 2)))
    assert (np.asarray(state3.cash) >= -1e-3).all()


def test_batched_host_env_adapter():
    """CustomGymEnv-parity host adapter: duck-types both gym conventions,
    auto-resets finished envs."""
    import numpy as np
    from rlsolver_tpu.envs.external import BatchedHostEnv

    class OldGym:
        def __init__(self):
            self.t = 0
        def reset(self):
            self.t = 0
            return np.array([0.0])
        def step(self, a):
            self.t += 1
            return np.array([float(self.t)]), 1.0, self.t >= 3, {}

    class NewGym:
        def __init__(self):
            self.t = 0
        def reset(self):
            self.t = 0
            return np.array([10.0]), {}
        def step(self, a):
            self.t += 1
            return np.array([10.0 + self.t]), 2.0, self.t >= 2, False, {}

    venv = BatchedHostEnv([OldGym, NewGym])
    obs = venv.reset()
    np.testing.assert_allclose(obs[:, 0], [0.0, 10.0])
    acts = np.zeros((2, 1))
    obs, rew, done = venv.step(acts)
    np.testing.assert_allclose(rew, [1.0, 2.0])
    assert not done.any()
    obs, rew, done = venv.step(acts)
    assert done[1] and not done[0]          # NewGym finished at t=2
    np.testing.assert_allclose(obs[1, 0], 10.0)  # auto-reset obs
    obs, rew, done = venv.step(acts)
    assert done[0]                          # OldGym finished at t=3
    np.testing.assert_allclose(obs[0, 0], 0.0)
