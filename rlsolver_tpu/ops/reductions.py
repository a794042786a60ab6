"""Elitist parallel-solution reductions (pure-functional).

Reference semantics (`rlsolver/methods/util_read_data.py:190-216`):
  * update_xs_by_vs: per-sim replace-if-strictly-better (in-place there,
    functional here).
  * pick_xs_by_vs: best-of-`num_repeats` gather — xs laid out as
    [num_repeats * num_sims, n], group r of sim b at row r*num_sims + b.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def update_xs_by_vs(
    good_xs: jax.Array,
    good_vs: jax.Array,
    xs: jax.Array,
    vs: jax.Array,
    maximize: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Keep the strictly better of (good_xs, xs) per sim."""
    better = vs > good_vs if maximize else vs < good_vs
    new_xs = jnp.where(better[:, None], xs, good_xs)
    new_vs = jnp.where(better, vs, good_vs)
    return new_xs, new_vs


def pick_xs_by_vs(
    xs: jax.Array, vs: jax.Array, num_repeats: int, maximize: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """Best-of-repeats: xs [R*B, N], vs [R*B] -> (xs [B, N], vs [B])."""
    total, n = xs.shape
    num_sims = total // num_repeats
    vs_r = vs.reshape(num_repeats, num_sims)
    best_r = jnp.argmax(vs_r, axis=0) if maximize else jnp.argmin(vs_r, axis=0)
    rows = best_r * num_sims + jnp.arange(num_sims)
    return xs[rows], vs[rows]


def evolutionary_replacement(
    key: jax.Array, xs: jax.Array, vs: jax.Array, low_k: int, maximize: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """Replace the `low_k` worst sims with copies of random good sims
    (reference `rlsolver/methods/util.py:87-94`)."""
    num_sims = vs.shape[0]
    order = jnp.argsort(-vs if maximize else vs)  # best first
    worst = order[num_sims - low_k :]
    donors = jax.random.randint(key, (low_k,), 0, num_sims - low_k)
    donor_rows = order[donors]
    xs = xs.at[worst].set(xs[donor_rows])
    vs = vs.at[worst].set(vs[donor_rows])
    return xs, vs
