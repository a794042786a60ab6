"""RL trainers for the three RL+OR pipelines (`solvers/rlor_train.py`).

Seeded regression tests: with the fixed seeds below, each learned policy
beats (or at worst ties) its classical baseline on held-out instances —
mirroring the reference's RL stages (`RL_cutting/run_PPO.py`,
`RL_branching/04_train_rl.py`, `RL_column_generation/training.py`).
"""

import numpy as np
import pytest

from rlsolver_tpu.solvers.branching import (
    branch_and_bound,
    generate_set_cover,
    most_fractional_policy,
)
from rlsolver_tpu.solvers.column_generation import (
    CuttingStockInstance,
    best_reduced_cost,
    solve_cutting_stock,
)
from rlsolver_tpu.solvers.cutting import max_violation_policy
from rlsolver_tpu.solvers.rlor_train import (
    ScorePolicy,
    _pricing_features,
    deceptive_knapsack_ilp,
    eval_branch_policy,
    eval_cut_policy,
    eval_pricing_policy,
    train_branch_policy_rl,
    train_cut_policy,
    train_pricing_policy,
)


def test_cut_policy_beats_max_violation():
    """REINFORCE cut-selector > max-violation on the deceptive family
    (high-violation covers on a low-stakes row vs deep low-violation cuts)."""
    net = train_cut_policy(
        num_updates=60, rounds=3, instance_fn=deceptive_knapsack_ilp, seed=0
    )
    eval_seeds = list(range(20))
    learned = eval_cut_policy(
        lambda f, c: net.greedy(f), eval_seeds, rounds=3,
        instance_fn=deceptive_knapsack_ilp,
    )
    classical = eval_cut_policy(
        max_violation_policy, eval_seeds, rounds=3,
        instance_fn=deceptive_knapsack_ilp,
    )
    assert learned < classical  # lower LP bound = tighter


def test_branch_rl_finetune_beats_il():
    """IL-pretrained then RL-fine-tuned selector < IL < most-fractional on
    geometric-mean node count, with identical objectives."""
    kw = dict(n_items=20, n_sets=40)
    train_insts = [generate_set_cover(seed=s, **kw) for s in range(8)]
    val_insts = [generate_set_cover(seed=s, **kw) for s in range(30, 36)]
    eval_insts = [generate_set_cover(seed=s, **kw) for s in range(50, 60)]
    samples = []
    for ilp in train_insts:
        st = branch_and_bound(ilp, use_strong=True, collect_samples=True,
                              max_nodes=600)
        samples += st.samples
    il = ScorePolicy(num_features=6, seed=0, max_candidates=8, hidden=64)
    il.imitate(samples, epochs=300)
    rl = train_branch_policy_rl(
        train_insts, num_updates=40, episodes_per_update=6, max_nodes=600,
        init_from=il, lr=5e-4, temperature=0.5, validation=val_insts, seed=0,
    )
    il_nodes, il_obj = eval_branch_policy(
        lambda f, c: il.greedy(f), eval_insts, max_nodes=3000
    )
    mf_nodes, mf_obj = eval_branch_policy(
        most_fractional_policy, eval_insts, max_nodes=3000
    )
    rl_nodes, rl_obj = eval_branch_policy(
        lambda f, c: rl.greedy(f), eval_insts, max_nodes=3000
    )
    assert rl_obj == pytest.approx(mf_obj)  # same optima found
    assert il_nodes < mf_nodes  # IL beats the hand rule
    assert rl_nodes < il_nodes  # RL fine-tune beats IL


def test_pricing_policy_at_least_ties_exact_pricing():
    """Learned pricing scorer <= exact most-negative-reduced-cost pricing on
    CG iterations at equal integer solution quality (strictly fewer total
    iterations on this seeded eval set)."""
    net = train_pricing_policy(num_updates=40, episodes_per_update=8, seed=0)
    eval_insts = [CuttingStockInstance.random(10, seed=s) for s in range(100, 130)]
    it_l = it_g = v_l = v_g = 0.0
    for inst in eval_insts:
        def p(duals, candidates, _inst=inst):
            return net.greedy(_pricing_features(_inst, duals, candidates))

        r1 = solve_cutting_stock(inst, policy=p, num_candidates=4)
        r2 = solve_cutting_stock(inst, policy=best_reduced_cost, num_candidates=4)
        it_l += r1.num_iterations
        it_g += r2.num_iterations
        v_l += r1.int_value
        v_g += r2.int_value
    assert v_l == pytest.approx(v_g)  # identical integer quality
    assert it_l < it_g  # fewer pricing iterations overall
