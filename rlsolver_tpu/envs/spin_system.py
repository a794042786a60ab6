"""Pattern-I vectorized node-flip MDP (S2V-DQN / ECO-DQN / PECO semantics).

Capability-parity rebuild of the reference's vectorized SpinSystem
(`rlsolver/methods/ECO_S2V/src/envs/spinsystem_PECO.py:306-486`, single-env
original `spinsystem.py:333-483`), as a pure-functional JAX env:

  * per-instance data (adjacency, hash vectors) is an explicit params pytree
    traced into the jitted step — swapping in a fresh random graph of the
    same size (distribution-wise training) does NOT trigger recompilation;
  * per-node flip gains are maintained *incrementally* (one adjacency-row
    gather + rank-1 update per step) instead of recomputed per step
    (the reference's incremental Delta-score, `spinsystem.py:581-`, batched);
  * the revisit detector (reference `HistoryBuffer`,
    `util_envs_PECO.py:228-`) keeps two independent 32-bit state hashes in a
    ring per env instead of packed full states — O(H) membership check.

Observables (reference `util_envs.py:40-59`, ECO set, exact normalizations
from `spinsystem_PECO.py:430-470`):
  0 spin state (signed; or (1-s)/2 if binary basis)
  1 immediate reward available  = gains / max_local_reward
  2 time since flip             (+1/max_steps per step, 0 at flipped node)
  3 distance from best score    = |score - best_obs_score| / max_local_reward
  4 distance from best state    = hamming(best_obs_spins, spins) (UNNORMALIZED,
                                  as in the reference)
  5 greedy actions available    = 1 - count(gains <= 0)/N
  6 termination immanency       = max(0, (step - max_steps)/horizon + 1)

Rewards (reference `spinsystem_PECO.py:370-405`): BLS (default),
CUSTOM_BLS, DENSE, SINGLE; optional /N normalization; optional basin reward
(local optimum & new state) and stagnation punishment (revisited state).
`memory_length` bounds the revisit memory to the last H visited states
(reference `HistoryBuffer(memory_length)`); None = whole episode.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.graph import Graph


class RewardSignal(enum.Enum):
    DENSE = "dense"
    BLS = "bls"
    SINGLE = "single"
    CUSTOM_BLS = "custom_bls"


class SpinBasis(enum.Enum):
    SIGNED = "signed"
    BINARY = "binary"


# The ECO/PECO observable set; S2V uses only the spin state.
NUM_OBSERVABLES_ECO = 7
NUM_OBSERVABLES_S2V = 1


@dataclasses.dataclass(frozen=True)
class SpinSystemConfig:
    num_envs: int = 256
    max_steps: int = 0  # 0 -> 2 * num_nodes (reference step_fact=2)
    reward_signal: RewardSignal = RewardSignal.BLS
    spin_basis: SpinBasis = SpinBasis.BINARY
    norm_rewards: bool = True
    basin_reward: Optional[float] = None  # reference ECO default: 1/N
    stag_punishment: Optional[float] = None
    reversible_spins: bool = True  # False = S2V-style irreversible
    num_observables: int = NUM_OBSERVABLES_ECO
    horizon_length: Optional[int] = None  # None -> max_steps
    memory_length: Optional[int] = None  # revisit memory; None = full episode


class SpinSystemParams(NamedTuple):
    """Per-instance data, traced (not baked) into the jitted step."""

    adj: jax.Array  # f32 [N, N] symmetric dense adjacency
    total_w: jax.Array  # f32 scalar, total edge weight
    max_local_reward: jax.Array  # f32 scalar, max flip gain at all-ones state
    hash_r1: jax.Array  # uint32 [N] random hash vector
    hash_r2: jax.Array  # uint32 [N]


class SpinSystemState(NamedTuple):
    spins: jax.Array  # f32 [B, N] signed +-1
    gains: jax.Array  # f32 [B, N] flip gains of current state
    # per-episode observation/reward scale: max flip gain AT THE RESET
    # STATE. DELIBERATE DEVIATION from the reference: `spinsystem.py:196`
    # recomputes max_local_reward_available from the ALL-ONES state
    # (spinsOne) on every reset, i.e. the max weighted degree — which on BA
    # graphs crushed observations ~5x (hub degree ~50 vs random-reset max
    # gain ~10) and ECO-DQN failed to learn even the greedy gain ranking.
    # Scaling by the actual reset state's max gain keeps obs O(1) per
    # episode; not a reference-parity claim.
    max_local: jax.Array  # f32 [B]
    score: jax.Array  # f32 [B]
    init_score: jax.Array  # f32 [B]
    best_score: jax.Array  # f32 [B]
    best_spins: jax.Array  # f32 [B, N]
    time_since_flip: jax.Array  # f32 [B, N]
    step_count: jax.Array  # int32 scalar
    hist_h1: jax.Array  # uint32 [B, H] ring of visited-state hashes
    hist_h2: jax.Array  # uint32 [B, H]


class SpinSystemEnv:
    """Static shapes/flags; all methods are pure and jittable with the
    instance data passed via `SpinSystemParams`."""

    def __init__(self, num_nodes: int, config: SpinSystemConfig = SpinSystemConfig()):
        self.num_nodes = num_nodes
        self.config = config
        self.max_steps = config.max_steps or 2 * num_nodes
        self.horizon = config.horizon_length or self.max_steps
        # ring slots: finite memory keeps only the last `memory_length`
        # hashes (the modular slot write below overwrites the oldest)
        self.history_capacity = config.memory_length or (self.max_steps + 1)

    # ---------------------------------------------------------------- params
    def params_from_graph(self, graph: Graph, hash_seed: int = 0) -> SpinSystemParams:
        if graph.num_nodes != self.num_nodes:
            raise ValueError(f"graph has {graph.num_nodes} nodes, env expects {self.num_nodes}")
        wdeg = graph.weighted_degrees()
        max_gain = float(wdeg.max())
        if max_gain <= 0:
            # the reference regenerates such graphs (spinsystem_PECO.py:163-171)
            raise ValueError("graph has no positive-gain flip from the all-ones state")
        rng = np.random.default_rng(hash_seed)
        r = rng.integers(1, 2**32, (2, self.num_nodes), dtype=np.uint64).astype(np.uint32)
        return SpinSystemParams(
            adj=jnp.asarray(graph.adjacency_dense(), jnp.float32),
            total_w=jnp.float32(graph.total_weight),
            max_local_reward=jnp.float32(max_gain),
            hash_r1=jnp.asarray(r[0]),
            hash_r2=jnp.asarray(r[1]),
        )

    # ------------------------------------------------------------------ hash
    @staticmethod
    def _state_hash(params: SpinSystemParams, spins: jax.Array):
        bits = spins > 0
        h1 = jnp.sum(jnp.where(bits, params.hash_r1[None, :], 0), axis=1, dtype=jnp.uint32)
        h2 = jnp.sum(jnp.where(bits, params.hash_r2[None, :], 0), axis=1, dtype=jnp.uint32)
        return jnp.maximum(h1, 1), jnp.maximum(h2, 1)  # 0 is the empty sentinel

    @staticmethod
    def _cut(params: SpinSystemParams, spins: jax.Array) -> jax.Array:
        sa = jnp.dot(spins, params.adj, preferred_element_type=jnp.float32)
        return 0.5 * params.total_w - 0.25 * jnp.sum(sa * spins, axis=-1)

    @staticmethod
    def _gains_full(params: SpinSystemParams, spins: jax.Array) -> jax.Array:
        sa = jnp.dot(spins, params.adj, preferred_element_type=jnp.float32)
        return sa * spins

    # ----------------------------------------------------------------- reset
    def reset(
        self, params: SpinSystemParams, key: jax.Array
    ) -> Tuple[SpinSystemState, jax.Array]:
        cfg = self.config
        b, n = cfg.num_envs, self.num_nodes
        if cfg.reversible_spins:
            spins = jnp.where(jax.random.bernoulli(key, 0.5, (b, n)), 1.0, -1.0).astype(
                jnp.float32
            )
        else:
            spins = jnp.ones((b, n), jnp.float32)
        gains = self._gains_full(params, spins)
        max_local = jnp.maximum(jnp.max(gains, axis=1), 1e-3)
        score = self._cut(params, spins)
        h1, h2 = self._state_hash(params, spins)
        hist_h1 = jnp.zeros((b, self.history_capacity), jnp.uint32).at[:, 0].set(h1)
        hist_h2 = jnp.zeros((b, self.history_capacity), jnp.uint32).at[:, 0].set(h2)
        state = SpinSystemState(
            spins=spins,
            gains=gains,
            max_local=max_local,
            score=score,
            init_score=score,
            best_score=score,
            best_spins=spins,
            time_since_flip=jnp.zeros((b, n), jnp.float32),
            step_count=jnp.int32(0),
            hist_h1=hist_h1,
            hist_h2=hist_h2,
        )
        return state, self.observation(params, state)

    # ------------------------------------------------------------------ step
    def step(
        self, params: SpinSystemParams, state: SpinSystemState, actions: jax.Array
    ) -> Tuple[SpinSystemState, jax.Array, jax.Array, jax.Array]:
        """actions: int32 [B] node to flip per env -> (state, obs, rew, done)."""
        cfg = self.config
        b, n = cfg.num_envs, self.num_nodes
        rows = jnp.arange(b)

        delta = state.gains[rows, actions]  # gain of the chosen flip
        s_a = state.spins[rows, actions]
        adj_rows = jnp.take(params.adj, actions, axis=0)  # [B, N]

        # rank-1 incremental gain update: gain_j -= 2 s_j s_a A_aj; gain_a *= -1
        gains = state.gains - 2.0 * (s_a[:, None] * state.spins) * adj_rows
        gains = gains.at[rows, actions].set(-delta)
        spins = state.spins.at[rows, actions].multiply(-1.0)
        score = state.score + delta

        # --- reward w.r.t. best score BEFORE this step (reference order)
        improvement = score - state.best_score
        if cfg.reward_signal == RewardSignal.BLS:
            rew = jnp.maximum(improvement, 0.0)
        elif cfg.reward_signal == RewardSignal.CUSTOM_BLS:
            rew = jnp.where(improvement > 0, improvement / (improvement + 0.1), 0.0)
        elif cfg.reward_signal == RewardSignal.DENSE:
            rew = delta
        else:  # SINGLE: only at episode end
            rew = jnp.zeros_like(delta)

        # --- revisit detection
        need_history = cfg.stag_punishment is not None or cfg.basin_reward is not None
        if need_history:
            h1, h2 = self._state_hash(params, spins)
            seen = jnp.any(
                (state.hist_h1 == h1[:, None]) & (state.hist_h2 == h2[:, None]), axis=1
            )
            slot = (state.step_count + 1) % self.history_capacity
            hist_h1 = state.hist_h1.at[:, slot].set(h1)
            hist_h2 = state.hist_h2.at[:, slot].set(h2)
            if cfg.stag_punishment is not None:
                rew = rew - jnp.where(seen, cfg.stag_punishment, 0.0)
            if cfg.basin_reward is not None:
                local_opt = jnp.all(gains <= 0.0, axis=1)
                rew = rew + jnp.where(local_opt & ~seen, cfg.basin_reward, 0.0)
        else:
            hist_h1, hist_h2 = state.hist_h1, state.hist_h2

        # --- incumbent update (after reward)
        better = score > state.best_score
        best_score = jnp.where(better, score, state.best_score)
        best_spins = jnp.where(better[:, None], spins, state.best_spins)

        step_count = state.step_count + 1
        done_now = step_count >= self.max_steps
        if cfg.reward_signal == RewardSignal.SINGLE:
            rew = jnp.where(done_now, score - state.init_score, rew)
        if cfg.norm_rewards:
            rew = rew / n

        tsf = state.time_since_flip + 1.0 / self.max_steps
        tsf = tsf.at[rows, actions].set(0.0)

        new_state = SpinSystemState(
            spins=spins,
            gains=gains,
            max_local=state.max_local,
            score=score,
            init_score=state.init_score,
            best_score=best_score,
            best_spins=best_spins,
            time_since_flip=tsf,
            step_count=step_count,
            hist_h1=hist_h1,
            hist_h2=hist_h2,
        )
        done = jnp.broadcast_to(done_now, (b,))
        return new_state, self.observation(params, new_state), rew, done

    # ----------------------------------------------------------- observation
    def observation(self, params: SpinSystemParams, state: SpinSystemState) -> jax.Array:
        """[B, N, num_observables] node features. The adjacency is passed to
        the network separately (it is per-instance, not per-step)."""
        cfg = self.config
        n = self.num_nodes
        if cfg.spin_basis == SpinBasis.BINARY:
            spin_obs = (1.0 - state.spins) / 2.0
        else:
            spin_obs = state.spins
        if cfg.num_observables == NUM_OBSERVABLES_S2V:
            return spin_obs[..., None]
        max_r = state.max_local  # [B] per-episode scale (reference parity)
        imm = state.gains / max_r[:, None]
        dist_score = jnp.abs(state.score - state.best_score) / max_r
        dist_state = jnp.sum(state.best_spins != state.spins, axis=1).astype(jnp.float32)
        greedy_avail = 1.0 - jnp.sum(state.gains <= 0.0, axis=1) / n
        imman = jnp.maximum(
            0.0, (state.step_count - self.max_steps) / self.horizon + 1.0
        ).astype(jnp.float32)
        bcast = lambda v: jnp.broadcast_to(v[:, None], spin_obs.shape)
        return jnp.stack(
            [
                spin_obs,
                imm,
                state.time_since_flip,
                bcast(dist_score),
                bcast(dist_state),
                bcast(greedy_avail),
                jnp.broadcast_to(imman, spin_obs.shape),
            ],
            axis=-1,
        )

    def allowed_action_mask(self, state: SpinSystemState) -> jax.Array:
        """bool [B, N]: flippable nodes — all if reversible, never-flipped
        (+1) spins otherwise (`get_allowed_action_states`,
        spinsystem_PECO.py:516-528)."""
        if self.config.reversible_spins:
            return jnp.ones(state.spins.shape, bool)
        return state.spins > 0
