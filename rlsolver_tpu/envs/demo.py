"""Demo continuous-control envs (ElegantRL demo-env parity).

Reference counterpart: `rlsolver/elegantrl/envs/` — `PointChasingEnv`
(268 LoC: chaser moves toward an evading target, reward = -distance) and
`StockTradingEnv` (387 LoC: daily portfolio rebalancing over price
series, reward = asset delta). Both exist to exercise the continuous
agents; here they are pure-functional batched state machines used with
`rlsolver_tpu.algos.continuous`.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------ point chasing
class PointChasingState(NamedTuple):
    chaser: jax.Array  # [B, 2]
    target: jax.Array  # [B, 2]
    t: jax.Array  # int32


@dataclasses.dataclass(frozen=True)
class PointChasingEnv:
    """Chaser vs drifting target; obs = [chaser, target, delta]."""

    dt: float = 0.2
    target_speed: float = 0.05
    horizon: int = 32

    @property
    def obs_dim(self) -> int:
        return 6

    @property
    def act_dim(self) -> int:
        return 2

    def reset(self, key: jax.Array, batch: int):
        k1, k2 = jax.random.split(key)
        chaser = jax.random.uniform(k1, (batch, 2), minval=-1.0, maxval=1.0)
        target = jax.random.uniform(k2, (batch, 2), minval=-1.0, maxval=1.0)
        state = PointChasingState(chaser, target, jnp.int32(0))
        return state, self.observe(state)

    def observe(self, state: PointChasingState) -> jax.Array:
        return jnp.concatenate(
            [state.chaser, state.target, state.target - state.chaser], axis=-1
        )

    def step(self, key: jax.Array, state: PointChasingState, action: jax.Array):
        action = jnp.clip(action, -1.0, 1.0)
        chaser = state.chaser + action * self.dt
        # target drifts away from the chaser with noise (the evade behavior)
        away = state.target - state.chaser
        away = away / (jnp.linalg.norm(away, axis=-1, keepdims=True) + 1e-6)
        noise = jax.random.normal(key, state.target.shape) * 0.02
        target = state.target + away * self.target_speed + noise
        target = jnp.clip(target, -2.0, 2.0)
        reward = -jnp.linalg.norm(chaser - target, axis=-1)
        t = state.t + 1
        done = jnp.broadcast_to(
            (t >= self.horizon).astype(jnp.float32), (reward.shape[0],)
        )
        new = PointChasingState(chaser, target, jnp.where(t >= self.horizon, 0, t))
        return new, self.observe(new), reward, done


# ------------------------------------------------------------- stock trading
class StockState(NamedTuple):
    cash: jax.Array  # [B]
    shares: jax.Array  # [B, S]
    day: jax.Array  # int32


@dataclasses.dataclass(frozen=True)
class StockTradingEnv:
    """Daily rebalancing over a fixed price tensor [T, S].

    Action in [-1, 1]^S scales to +-`max_trade` shares per stock; reward =
    change in total assets (the reference's reward semantics). Prices are
    static instance data (e.g. a geometric-random-walk sample).
    """

    prices: np.ndarray  # [T, S]
    initial_cash: float = 1e4
    max_trade: float = 10.0

    @property
    def num_stocks(self) -> int:
        return int(self.prices.shape[1])

    @property
    def num_days(self) -> int:
        return int(self.prices.shape[0])

    @property
    def obs_dim(self) -> int:
        return 1 + 2 * self.num_stocks

    @staticmethod
    def random_walk(num_days: int, num_stocks: int, seed: int = 0) -> "StockTradingEnv":
        rng = np.random.RandomState(seed)
        rets = rng.normal(0.0003, 0.02, (num_days, num_stocks))
        prices = 50.0 * np.exp(np.cumsum(rets, axis=0))
        return StockTradingEnv(prices.astype(np.float32))

    def _prices(self, day):
        return jnp.asarray(self.prices)[day]

    def assets(self, state: StockState) -> jax.Array:
        p = self._prices(state.day)
        return state.cash + (state.shares * p[None, :]).sum(axis=-1)

    def reset(self, batch: int):
        state = StockState(
            jnp.full((batch,), self.initial_cash),
            jnp.zeros((batch, self.num_stocks)),
            jnp.int32(0),
        )
        return state, self.observe(state)

    def observe(self, state: StockState) -> jax.Array:
        p = self._prices(state.day)
        return jnp.concatenate(
            [
                state.cash[:, None] / self.initial_cash,
                state.shares,
                jnp.broadcast_to(p[None, :], state.shares.shape) / 100.0,
            ],
            axis=-1,
        )

    def step(self, state: StockState, action: jax.Array):
        p = self._prices(state.day)
        trade = jnp.clip(action, -1.0, 1.0) * self.max_trade
        # sells capped by holdings, buys capped by cash (greedy scale-down)
        trade = jnp.maximum(trade, -state.shares)
        cost = (trade * p[None, :]).sum(axis=-1)
        scale = jnp.where(
            cost > state.cash, state.cash / jnp.maximum(cost, 1e-9), 1.0
        )
        trade = trade * jnp.minimum(scale, 1.0)[:, None]
        cost = (trade * p[None, :]).sum(axis=-1)

        before = self.assets(state)
        shares = state.shares + trade
        cash = state.cash - cost
        day = jnp.minimum(state.day + 1, self.num_days - 1)
        new = StockState(cash, shares, day)
        reward = self.assets(new) - before
        done = jnp.broadcast_to(
            (day >= self.num_days - 1).astype(jnp.float32), (reward.shape[0],)
        )
        return new, self.observe(new), reward, done
