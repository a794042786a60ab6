"""Learn-to-branch pipeline: generators, B&B, strong branching, IL."""

import numpy as np
import pytest

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.solvers.branching import (
    BinaryILP,
    BranchNet,
    branch_and_bound,
    branching_features,
    generate_cauctions,
    generate_facility,
    generate_indset,
    generate_set_cover,
    most_fractional_policy,
)
from rlsolver_tpu.solvers import milp as milp_mod


GENERATORS = [
    lambda s: generate_set_cover(12, 8, seed=s),
    lambda s: generate_indset(graph_from_name(f"BA_14_ID{s}"), seed=s),
    lambda s: generate_cauctions(10, 12, seed=s),
    lambda s: generate_facility(4, 3, seed=s),
]


@pytest.mark.parametrize("gen", GENERATORS)
def test_bnb_matches_scipy_milp(gen):
    ilp = gen(0)
    stats = branch_and_bound(ilp)
    # oracle: scipy milp on the same model
    from scipy.optimize import Bounds, LinearConstraint, milp

    res = milp(
        c=-ilp.c,
        constraints=LinearConstraint(ilp.a, ub=ilp.b),
        integrality=np.ones(ilp.num_vars),
        bounds=Bounds(0, 1),
    )
    assert abs(stats.objective - (-res.fun)) < 1e-6
    assert (ilp.a @ stats.solution <= ilp.b + 1e-6).all()


def test_indset_bnb_matches_mis_solver():
    g = graph_from_name("BA_16_ID0")
    ilp = generate_indset(g)
    stats = branch_and_bound(ilp)
    res = milp_mod.solve_mis(g)
    assert abs(stats.objective - res.obj) < 1e-6


def test_strong_branching_fewer_nodes_than_fractional():
    # strong branching should need no MORE nodes than most-fractional
    totals = {"strong": 0, "frac": 0}
    for s in range(3):
        ilp = generate_set_cover(14, 10, seed=s)
        totals["strong"] += branch_and_bound(ilp, use_strong=True).num_nodes
        totals["frac"] += branch_and_bound(ilp).num_nodes
    assert totals["strong"] <= totals["frac"] * 1.2 + 4


def test_il_pipeline_end_to_end():
    # 1-3: collect strong-branching samples over training instances
    samples = []
    for s in range(4):
        ilp = generate_set_cover(20, 10, seed=s)
        stats = branch_and_bound(ilp, use_strong=True, collect_samples=True)
        samples.extend(stats.samples)
    assert samples
    # 4: train IL policy
    net = BranchNet(hidden=32, seed=0)
    history = net.train_il(samples, epochs=150)
    assert history[-1] < history[0]
    # 5: evaluate — learned policy solves to optimality
    ilp = generate_set_cover(20, 10, seed=99)
    learned = branch_and_bound(ilp, policy=net.policy())
    oracle = branch_and_bound(ilp, use_strong=True)
    assert abs(learned.objective - oracle.objective) < 1e-6


def test_features_shape():
    ilp = generate_set_cover(10, 6, seed=1)
    x = np.clip(np.random.RandomState(0).rand(ilp.num_vars), 0.01, 0.99)
    cand = np.asarray([0, 2, 4])
    f = branching_features(ilp.c, ilp.a, x, cand)
    assert f.shape == (3, 6)
    assert np.isfinite(f).all()
