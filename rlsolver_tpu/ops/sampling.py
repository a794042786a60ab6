"""Batched sampling primitives for MCMC-style CO methods.

Reference counterparts:
  * metropolis_bitflip_chain — MCPG's `metro_sampling`
    (`rlsolver/methods/MCPG.py:88-118`): each chain proposes single-bit flips
    at uniform random nodes against a shared policy probability vector and
    accepts with rate (1-p)/p, until an aggregate accept budget of
    `num_chains * max_transfer_time` is spent (round cap 5x, as in the
    reference). The budgeted while-loop is data-dependent, which is fine for
    jit via `lax.while_loop` (no reverse-mode grad is taken through it).
  * gumbel_topk — ISCO's no-replacement proposal
    (`rlsolver/methods/util.py:498-555`): sample k items without replacement
    proportionally to softmax(logits) by perturbing with Gumbel noise and
    taking top-k.
  * mh_accept — generic Metropolis-Hastings accept step
    (`rlsolver/methods/util.py:562-570`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def bernoulli_logp(probs: jax.Array, bits: jax.Array) -> jax.Array:
    """Sum over the node axis of log P(bits | probs). [.., N] -> [..]."""
    p = jnp.where(bits.astype(bool), probs, 1.0 - probs)
    return jnp.sum(jnp.log(p), axis=-1)


def gumbel_topk(key: jax.Array, logits: jax.Array, k: int) -> jax.Array:
    """Indices of a size-k no-replacement sample ~ softmax(logits). [..,N]->[..,k]."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    _, idx = jax.lax.top_k(logits + g, k)
    return idx


def mh_accept(
    key: jax.Array, log_alpha: jax.Array
) -> jax.Array:
    """Metropolis accept mask: u < exp(log_alpha). log_alpha: [...] -> bool [...]."""
    u = jax.random.uniform(key, log_alpha.shape)
    return jnp.log(u) < log_alpha


class ChainResult(NamedTuple):
    samples: jax.Array  # bool [C, N]
    num_accepted: jax.Array  # int32 scalar
    num_rounds: jax.Array  # int32 scalar


def metropolis_bitflip_chain(
    key: jax.Array,
    probs: jax.Array,
    samples: jax.Array,
    max_transfer_time: int,
    round_cap_factor: int = 5,
) -> ChainResult:
    """MCPG policy-targeted bit-flip MH over [C, N] boolean chains.

    Per round, every chain proposes flipping one uniform random node i and
    accepts with probability min(1, (1-q)/q) where q = probs[i] if the bit is
    currently 1 else 1-probs[i] (so the stationary distribution is the
    independent Bernoulli(probs) product measure). Runs until
    `C * max_transfer_time` total accepts or `round_cap_factor *
    max_transfer_time` rounds, whichever first.
    """
    num_chains, num_nodes = samples.shape
    budget = num_chains * max_transfer_time
    round_cap = round_cap_factor * max_transfer_time

    def cond(state):
        _, _, count, t = state
        return jnp.logical_and(count < budget, t < round_cap)

    def body(state):
        samples, key, count, t = state
        key, k_node, k_u = jax.random.split(key, 3)
        nodes = jax.random.randint(k_node, (num_chains,), 0, num_nodes)
        p_base = probs[nodes]  # [C]
        cur = jnp.take_along_axis(samples, nodes[:, None], axis=1)[:, 0]  # [C]
        q = jnp.where(cur, p_base, 1.0 - p_base)
        accept_rate = (1.0 - q) / q
        accept = jax.random.uniform(k_u, (num_chains,)) < accept_rate
        flipped = jnp.where(accept, ~cur, cur)
        samples = jax.vmap(lambda row, n, v: row.at[n].set(v))(samples, nodes, flipped)
        return samples, key, count + jnp.sum(accept, dtype=jnp.int32), t + 1

    samples, _, count, t = jax.lax.while_loop(
        cond, body, (samples, key, jnp.int32(0), jnp.int32(0))
    )
    return ChainResult(samples, count, t)


def metropolis_bitflip_scan(
    key: jax.Array,
    probs: jax.Array,
    samples: jax.Array,
    num_rounds: int,
) -> jax.Array:
    """Fixed-trip variant of `metropolis_bitflip_chain` (scan, unrollable).

    Runs exactly `num_rounds` proposal rounds with no accept budget — the
    throughput-oriented form used by the benchmark and by samplers that want
    a statically-shaped program.
    """
    num_chains, num_nodes = samples.shape

    def body(samples, key):
        k_node, k_u = jax.random.split(key)
        nodes = jax.random.randint(k_node, (num_chains,), 0, num_nodes)
        p_base = probs[nodes]
        cur = jnp.take_along_axis(samples, nodes[:, None], axis=1)[:, 0]
        q = jnp.where(cur, p_base, 1.0 - p_base)
        accept = jax.random.uniform(k_u, (num_chains,)) < (1.0 - q) / q
        flipped = jnp.where(accept, ~cur, cur)
        samples = jax.vmap(lambda row, n, v: row.at[n].set(v))(samples, nodes, flipped)
        return samples, None

    samples, _ = jax.lax.scan(body, samples, jax.random.split(key, num_rounds))
    return samples


def sub_set_sampling(
    key: jax.Array,
    probs: jax.Array,
    start_xs: jax.Array,
    num_repeats: int,
    top_k: int,
) -> jax.Array:
    """Uncertainty-guided subset resampling (L2A's `sub_set_sampling`,
    `rlsolver/methods/L2A/transformer.py:335-354`).

    Tile `start_xs` [B, N] into `num_repeats` copies and resample only the
    `top_k` most *uncertain* bits (smallest |p - 0.5|) of each sim from their
    policy probabilities; high-certainty bits keep the incumbent's values.
    (The reference samples the uncertain bits against the determinism value
    itself — an apparent slip; this implements the evident intent of
    sampling them from `probs`.) Returns bool [num_repeats * B, N] with
    repeat r of sim b at row r * B + b.
    """
    num_sims, num_nodes = probs.shape
    determinism = jnp.abs(probs - 0.5)
    k = min(top_k, num_nodes)
    _, uncertain_ids = jax.lax.top_k(-determinism, k)  # [B, k]
    xs = jnp.tile(start_xs, (num_repeats, 1))  # [R*B, N]
    ids = jnp.tile(uncertain_ids, (num_repeats, 1))  # [R*B, k]
    p = jnp.tile(jnp.take_along_axis(probs, uncertain_ids, axis=1), (num_repeats, 1))
    draws = jax.random.uniform(key, p.shape) < p  # [R*B, k]
    rows = jnp.arange(xs.shape[0])[:, None]
    return xs.at[rows, ids].set(draws)
