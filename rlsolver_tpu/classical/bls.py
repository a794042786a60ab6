"""Breakout Local Search for maxcut, batched.

Reference counterpart: `rlsolver/methods_problem_specific/maxcut/BLS.py` +
`main_BLS.py` — the classic BLS schema (Benlic & Hao): steepest-descent
1-flip to a local optimum, then an *adaptive* perturbation whose strength
grows while the search keeps falling back to already-visited optima, mixing
directed (tabu-respecting best-flip) and random moves.

TPU-first: all chains run the loop in lockstep inside one jitted scan;
descent is the incremental-gain sweep from `MaxcutEnv.sweep_1flip`;
stagnation/strength bookkeeping is per-chain vector state. Revisit
detection uses a solution fingerprint (hash) ring per chain — the
reference's HistoryBuffer equivalent without storing full solutions.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.envs.maxcut import MaxcutEnv


@dataclasses.dataclass
class BLSConfig:
    num_chains: int = 256
    num_rounds: int = 40  # descent+perturb cycles
    base_strength: int = 3  # L0: initial perturbation flips
    max_strength_frac: float = 0.25  # cap L at frac * N
    strength_step: int = 2  # growth on stagnation
    history_len: int = 8  # fingerprint ring size
    seed: int = 0
    packed_sweep: bool = False  # bit-packed Pallas 1-flip sweep (TPU; the
    # chunked bit-plane kernel makes this the G70-scale production path)


def _fingerprint(bits: jax.Array, salt: jax.Array) -> jax.Array:
    """Cheap per-chain solution hash, int32 [B]."""
    x = bits.astype(jnp.uint32)
    return (x * salt[None, :]).sum(axis=1).astype(jnp.int32)


def solve_maxcut_bls(
    graph: Graph,
    cfg: BLSConfig = BLSConfig(),
    record=None,
    time_budget: Optional[float] = None,
) -> Tuple[np.ndarray, float, list]:
    """Returns (best bits, best cut, per-round best history).

    `record(round_idx, best_cut)` is called after every round (for
    cut-vs-time curves); `time_budget` (seconds) stops the outer python
    loop early once exceeded."""
    env = MaxcutEnv(graph, packed_sweep=cfg.packed_sweep)
    n = graph.num_nodes
    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_salt, key = jax.random.split(key, 3)
    salt = jax.random.randint(k_salt, (n,), 1, 2**22).astype(jnp.uint32)
    max_strength = max(cfg.base_strength + 1, int(cfg.max_strength_frac * n))

    xs = env.random_xs(k_init, cfg.num_chains)
    vs = env.obj(xs)

    def round_step(carry, k):
        xs, vs, best_xs, best_vs, strength, history, hist_ptr = carry
        # 1) steepest descent to a local optimum (two sweeps)
        xs, vs = env.sweep_1flip(xs, vs)
        xs, vs = env.sweep_1flip(xs, vs)

        improved = vs > best_vs
        best_xs = jnp.where(improved[:, None], xs, best_xs)
        best_vs = jnp.where(improved, vs, best_vs)

        # 2) revisit detection via fingerprint ring
        fp = _fingerprint(xs, salt)
        revisit = (history == fp[:, None]).any(axis=1)
        history = history.at[jnp.arange(xs.shape[0]), hist_ptr].set(fp)
        hist_ptr = (hist_ptr + 1) % cfg.history_len

        # 3) adaptive strength: grow on revisit/stagnation, reset on improve
        strength = jnp.where(
            improved,
            cfg.base_strength,
            jnp.minimum(
                strength + jnp.where(revisit, cfg.strength_step, 0), max_strength
            ),
        )

        # 4) perturb: flip the `strength` highest noisy-gain positions
        # (directed moves) mixed with pure noise (random moves)
        k_dir, k_rand, k_mix = jax.random.split(k, 3)
        gains = env.gains(xs)
        noise = jax.random.gumbel(k_dir, gains.shape)
        directed_score = gains + noise * jnp.abs(gains).mean(axis=1, keepdims=True)
        random_score = jax.random.gumbel(k_rand, gains.shape)
        use_random = jax.random.bernoulli(k_mix, 0.5, (xs.shape[0], 1))
        score = jnp.where(use_random, random_score, directed_score)
        # per-chain threshold = strength-th largest score
        sorted_scores = jnp.sort(score, axis=1)[:, ::-1]
        thresh = jnp.take_along_axis(
            sorted_scores, (strength - 1)[:, None], axis=1
        )
        flip = score >= thresh
        xs = jnp.logical_xor(xs, flip)
        vs = env.obj(xs)
        return (xs, vs, best_xs, best_vs, strength, history, hist_ptr), jnp.max(
            best_vs
        )

    strength0 = jnp.full((cfg.num_chains,), cfg.base_strength, jnp.int32)
    history0 = jnp.zeros((cfg.num_chains, cfg.history_len), jnp.int32)
    carry = (xs, vs, xs, vs, strength0, history0, jnp.int32(0))
    # one jitted round, python loop outside: scanning all rounds into a
    # single XLA program makes the (sweep-in-round) compile pathological
    # on some backends, and the loop is only tens of iterations
    step = jax.jit(lambda carry, k: round_step(carry, k))
    best_hist = []
    t_start = time.time()
    for i, k in enumerate(jax.random.split(key, cfg.num_rounds)):
        carry, best = step(carry, k)
        best_hist.append(float(best))
        if record is not None:
            record(i, best_hist[-1])
        if time_budget is not None and time.time() - t_start > time_budget:
            break
    _, _, best_xs, best_vs, _, _, _ = carry
    b = int(jnp.argmax(best_vs))
    return np.asarray(best_xs[b]), float(best_vs[b]), best_hist
