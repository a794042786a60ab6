"""Pattern-I vectorized flip MDP: one node flip per env per step.

Reference counterpart: `rlsolver/envs/env_PPO.py:63-126` (`EnvMaxcut`) — a
gym-style vectorized maxcut env where the action is a node index, the state
is the current bit vector, reward is the cut delta, and episodes end after a
fixed horizon. The reference flips with a python loop over envs
(`step` `env_PPO.py:94-95`) and recomputes the full objective per step; here
the flip is one batched scatter and the reward uses the per-node flip gain
(identical value, O(E/N) work instead of O(E)).

The observation is the raw bit vector (what the reference's MLP agent sees,
`methods/PPO.py:55-80`); GNN agents additionally receive the static
normalized adjacency.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.ops import cut as cut_ops


class FlipMdpState(NamedTuple):
    xs: jax.Array  # bool [B, N]
    cut: jax.Array  # f32 [B] current objective
    t: jax.Array  # int32 [] step count within the episode


class FlipMdpEnv:
    """Static per-instance data + pure jittable reset/step (maximize cut)."""

    def __init__(self, graph: Graph, horizon: int, dtype=jnp.float32):
        self.graph = graph
        self.num_nodes = graph.num_nodes
        self.horizon = horizon
        self.cg = cut_ops.CutGraph.build(graph, dtype=dtype)

    def reset(
        self,
        key: jax.Array,
        num_envs: int,
        start_bits: Optional[jax.Array] = None,
    ) -> Tuple[FlipMdpState, jax.Array]:
        """`start_bits` [N] warm-starts every env from a known solution
        (the reference's `Config.start_str` base64 warm start,
        `methods/PPO.py:19-21`); default is the random node-0-pinned init."""
        if start_bits is not None:
            xs = jnp.broadcast_to(
                jnp.asarray(start_bits, bool)[None, :], (num_envs, self.num_nodes)
            )
        else:
            xs = jax.random.bernoulli(key, 0.5, (num_envs, self.num_nodes))
            xs = xs.at[:, 0].set(False)  # node-0 pin (`env_PPO.py:124-126`)
        cut = cut_ops.cut_value(xs, self.cg)
        state = FlipMdpState(xs, cut, jnp.int32(0))
        return state, self.observe(state)

    def observe(self, state: FlipMdpState) -> jax.Array:
        return state.xs.astype(jnp.float32)

    def step(
        self, state: FlipMdpState, actions: jax.Array
    ) -> Tuple[FlipMdpState, jax.Array, jax.Array, jax.Array]:
        """actions: int32 [B] node to flip. Returns (state, obs, reward, done).

        reward = cut delta = the flipped node's gain; done after `horizon`
        steps (auto-reset is the caller's choice, as in the reference where
        `reset()` is explicit).
        """
        b = state.xs.shape[0]
        gains = cut_ops.flip_gains(state.xs, self.cg)
        reward = jnp.take_along_axis(gains, actions[:, None], axis=1)[:, 0]
        xs = state.xs.at[jnp.arange(b), actions].set(
            ~state.xs[jnp.arange(b), actions]
        )
        cut = state.cut + reward
        t = state.t + 1
        done = jnp.broadcast_to((t >= self.horizon).astype(jnp.float32), (b,))
        t = jnp.where(t >= self.horizon, 0, t)
        new_state = FlipMdpState(xs, cut, t)
        return new_state, self.observe(new_state), reward, done
