"""Edge-pair sweep (maxcut_edge MCPG variant)."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.ops.sweeps import edge_pair_sweep
from rlsolver_tpu.ops import cut as cut_ops
from rlsolver_tpu.problems.objectives import obj_maxcut
from rlsolver_tpu.algos.mcpg_multi import (
    MultiMCPGConfig,
    maxcut_edge_problem,
    solve_mcpg,
)


def test_edge_sweep_improves_cut():
    g = graph_from_name("BA_32_ID0")
    cg = cut_ops.CutGraph.build(g)
    key = jax.random.PRNGKey(0)
    xs = jax.random.bernoulli(key, 0.5, (32, 32))
    v0 = cut_ops.cut_value(xs, cg)
    out = jax.jit(lambda k, x: edge_pair_sweep(k, x, g, num_sweeps=2, noise_scale=0.0))(
        key, xs
    )
    v1 = cut_ops.cut_value(out, cg)
    assert float(v1.mean()) > float(v0.mean())
    # noiseless pair choice never worsens the pair-local objective overall
    assert float(v1.max()) >= float(v0.max())
    # device values match the host objective
    for b in (0, 7, 31):
        assert float(v1[b]) == obj_maxcut(np.asarray(out[b]).astype(int), g)


def test_mcpg_maxcut_edge_beats_random():
    g = graph_from_name("BA_24_ID1")
    res = solve_mcpg(
        maxcut_edge_problem(g),
        MultiMCPGConfig(num_chains=16, repeat_times=2, num_rounds=8),
    )
    assert res.best_score > 0.5 * g.total_weight
    assert res.best_score == obj_maxcut(res.best_bits.astype(int), g)
