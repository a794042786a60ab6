"""Learn-to-cut env: cover-cut separation and the cutting-plane loop."""

import numpy as np

from rlsolver_tpu.solvers.branching import BinaryILP, generate_cauctions
from rlsolver_tpu.solvers.cutting import (
    CuttingPlaneEnv,
    cut_features,
    cutting_plane_loop,
    max_violation_policy,
    separate_cover_cuts,
)


def knapsack_ilp(seed=0, n=12):
    rng = np.random.RandomState(seed)
    w = rng.uniform(1, 10, n)
    p = w + rng.uniform(0, 2, n)  # correlated: fractional LP root
    cap = 0.5 * w.sum()
    return BinaryILP(p, w[None, :], np.asarray([cap]), "knapsack")


def test_cover_cut_validity():
    ilp = knapsack_ilp(0)
    from scipy.optimize import linprog

    res = linprog(c=-ilp.c, A_ub=ilp.a, b_ub=ilp.b, bounds=(0, 1), method="highs")
    x = np.asarray(res.x)
    cuts = separate_cover_cuts(ilp, x)
    assert cuts
    for cut in cuts:
        # violated at x*
        assert x[cut.cover].sum() > cut.rhs + 1e-7
        assert abs(cut.violation - (x[cut.cover].sum() - cut.rhs)) < 1e-5
        # valid for every feasible integer point: cover weight exceeds rhs
        assert ilp.a[cut.source_row, cut.cover].sum() > ilp.b[cut.source_row]


def test_cutting_loop_tightens_bound():
    ilp = knapsack_ilp(1)
    root, final, added = cutting_plane_loop(ilp, max_rounds=30)
    assert added >= 1
    assert final <= root + 1e-9
    # bound must stay above the integer optimum
    from scipy.optimize import Bounds, LinearConstraint, milp

    res = milp(
        c=-ilp.c,
        constraints=LinearConstraint(ilp.a, ub=ilp.b),
        integrality=np.ones(ilp.num_vars),
        bounds=Bounds(0, 1),
    )
    opt = -res.fun
    assert final >= opt - 1e-6
    assert final < root  # strictly tightened on this instance


def test_env_step_reward_matches_bound_delta():
    ilp = knapsack_ilp(2)
    env = CuttingPlaneEnv(ilp)
    feats, cuts = env.reset()
    assert feats.shape[0] == len(cuts)
    b0 = env.bound
    _, _, reward, _ = env.step(cuts, 0)
    assert abs((b0 - env.bound) - reward) < 1e-9
    assert reward >= -1e-9


def test_policy_hook_called():
    ilp = knapsack_ilp(3)
    calls = []

    def policy(feats, cuts):
        calls.append(len(cuts))
        return max_violation_policy(feats, cuts)

    cutting_plane_loop(ilp, policy=policy, max_rounds=5)
    assert calls


def test_cauctions_rows_separable():
    # auction rows are knapsack-type (0/1 coefficients, rhs 1): cuts exist
    # only when some row has >= 2 fractional winners; just assert the loop
    # runs and never loosens the bound
    ilp = generate_cauctions(10, 14, seed=5)
    root, final, added = cutting_plane_loop(ilp, max_rounds=10)
    assert final <= root + 1e-9
