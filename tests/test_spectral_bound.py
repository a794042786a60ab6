"""Certified spectral maxcut upper bound (`classical/spectral_bound.py`).

Reference parity target: the benchmark tables' Gurobi "obj bound" column
(`rlsolver/methods/gurobi.py:331-336`) — here produced license-free by the
Poljak-Rendl eigenvalue bound with rigorous trace-power certification."""

import numpy as np
import pytest

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.classical.spectral_bound import (
    SpectralBoundConfig,
    certified_bound,
    certify_lambda_max,
    maxcut_upper_bound,
    _laplacian,
)
from rlsolver_tpu.problems.objectives import obj_maxcut


def test_certify_lambda_max_is_rigorous_and_tight():
    rng = np.random.default_rng(0)
    for n in (5, 40, 120):
        a = rng.normal(size=(n, n))
        m = (a + a.T) / 2
        lam = float(np.linalg.eigvalsh(m).max())
        cert = certify_lambda_max(m, squarings=10)
        assert cert >= lam  # rigorous upper bound
        # worst-case slack factor is n^(1/2k) with k = 2^10 (~0.5%)
        assert cert <= lam * (1 + float(n) ** (1 / 2048.0) - 1 + 1e-9) + 1e-9


def test_bound_dominates_bruteforce_optimum():
    # tiny graph: enumerate all cuts exactly
    g = graph_from_name("BA_14_ID0")
    n = g.num_nodes
    best = 0.0
    for mask in range(1 << (n - 1)):
        bits = [(mask >> i) & 1 for i in range(n)]
        best = max(best, obj_maxcut(bits, g))
    b, info = maxcut_upper_bound(g, SpectralBoundConfig(opt_iters=300))
    assert b >= best
    assert info["trivial_bound"] >= b - 1e-9 or b <= info["trivial_bound"]


def test_bound_beats_trivial_and_is_sdp_tight_ba100():
    # BA_100_ID0's optimum is 282 (MILP-proved in the committed table);
    # the optimized PR bound must land within ~7% of it (the SDP optimum
    # for this instance is ~297.6), far below the trivial u=0 bound.
    g = graph_from_name("BA_100_ID0")
    b, info = maxcut_upper_bound(g, SpectralBoundConfig(opt_iters=800))
    assert b >= 282.0
    assert b <= 282.0 * 1.08
    assert b < info["trivial_bound"] * 0.5


def test_certified_bound_valid_for_any_u():
    g = graph_from_name("BA_48_ID0")
    lap = _laplacian(g)
    n = g.num_nodes
    rng = np.random.default_rng(1)
    # exhaustively find the optimum via greedy+SA stand-in: use known
    # property instead — bound(u) must dominate every random cut value
    xs = rng.integers(0, 2, size=(64, n))
    cuts = [obj_maxcut(list(x), g) for x in xs]
    for _ in range(3):
        u = rng.normal(size=n) * 2.0
        b = certified_bound(lap, u, squarings=10)
        assert b >= max(cuts)
