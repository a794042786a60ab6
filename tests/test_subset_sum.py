"""Portfolio subset-sum env, sweep, and MCPG integration."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.problems.subset_sum import (
    SubsetSumEnv,
    read_amounts_csv,
    subset_sum_problem,
)
from rlsolver_tpu.algos.mcpg_multi import MultiMCPGConfig, solve_mcpg


def test_read_amounts_csv(tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("id,amount,tag\n0,1.23,JF\n1,-4.56,JW\n2,0.10,JF\n")
    amounts = read_amounts_csv(str(p))
    np.testing.assert_array_equal(amounts, [123, -456, 10])


def test_objective_matches_host():
    rng = np.random.RandomState(0)
    amounts = rng.randint(-100, 100, 20)
    env = SubsetSumEnv(amounts)
    bits = rng.rand(8, 20) < 0.5
    dev = np.asarray(env.obj(jnp.asarray(bits)))
    for b in range(8):
        expect = bits[b].sum() - abs((amounts * bits[b]).sum())
        assert abs(dev[b] - expect) < 1e-4


def test_tagged_objective():
    amounts = np.asarray([10, -10, 5, -5])
    tags = [0, 0, 1, 1]
    env = SubsetSumEnv(amounts, tags=tags)
    bits = jnp.asarray([[True, True, True, True], [True, False, False, True]])
    comp = np.asarray(env.components(bits))
    # all selected: count 4, |total| 0, |tag0| 0, |tag1| 0
    np.testing.assert_allclose(comp[0], [4, 0, 0, 0])
    # items 0 and 3: count 2, total |10-5|=5, tag0 |10|, tag1 |-5|
    np.testing.assert_allclose(comp[1], [2, 5, 10, 5])
    assert float(env.obj(bits)[0]) == 4.0


def test_sweep_improves():
    rng = np.random.RandomState(1)
    amounts = rng.randint(-50, 50, 30)
    env = SubsetSumEnv(amounts)
    bits = env.random_bits(jax.random.PRNGKey(0), 16)
    v0 = env.obj(bits)
    out = jax.jit(lambda b: env.sweep(b, num_sweeps=2))(bits)
    v1 = env.obj(out)
    assert (np.asarray(v1) >= np.asarray(v0) - 1e-5).all()
    assert float(v1.mean()) > float(v0.mean())


def test_mcpg_subset_sum():
    rng = np.random.RandomState(2)
    amounts = rng.randint(-50, 50, 24)
    env = SubsetSumEnv(amounts)
    res = solve_mcpg(
        subset_sum_problem(env),
        MultiMCPGConfig(num_chains=16, repeat_times=4, num_rounds=10),
    )
    # a perfectly balanced selection scores = its size; must beat empty set
    assert res.best_score > 0
