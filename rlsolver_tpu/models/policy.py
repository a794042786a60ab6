"""Policy networks for Pattern-II (QUBO policy-vector) methods.

  * BernoulliPolicy — MCPG's `Simpler` (`rlsolver/methods/MCPG.py:169-186`):
    a free per-node logit vector mapped through sigmoid and squashed into
    (0.2, 0.8) so no bit saturates.
  * PolicyMLP — L2A's `PolicyMLP` (`rlsolver/methods/L2A/network.py:124-143`):
    maps the current solution-probability vector to a refined one.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BernoulliPolicy(nn.Module):
    """Per-node Bernoulli probabilities, squashed to (lo, lo + span)."""

    num_nodes: int
    lo: float = 0.2
    span: float = 0.6

    @nn.compact
    def __call__(self) -> jax.Array:
        logits = self.param("logits", nn.initializers.zeros, (self.num_nodes,))
        return nn.sigmoid(logits) * self.span + self.lo


class PolicyMLP(nn.Module):
    """Solution-probability refiner: [B, N] -> [B, N] in (0, 1)."""

    num_nodes: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, probs: jax.Array) -> jax.Array:
        x = probs
        for i, width in enumerate(self.hidden):
            x = nn.relu(nn.Dense(width, name=f"hidden_{i}")(x))
        x = nn.Dense(self.num_nodes, name="out")(x)
        return nn.sigmoid(x)
