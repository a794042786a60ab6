"""PI-GNN: relaxed-QUBO GNN solver (reference `PIGNN/main.py:17-101`)."""

import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.algos.pignn import PIGNNConfig, solve_maxcut_pignn, solve_mis_pignn
from rlsolver_tpu.models.gcn import GCN, GCNActorCritic, normalized_adjacency
from rlsolver_tpu.problems.objectives import obj_maxcut, obj_maximum_independent_set


def small_cfg():
    return PIGNNConfig(hidden=(32,), max_steps=300, patience=100, seed=0)


def test_normalized_adjacency_rows():
    g = graph_from_name("BA_32_ID0")
    a = normalized_adjacency(g)
    assert a.shape == (32, 32)
    # symmetric, nonnegative, spectral radius <= 1 for D^-1/2 (A+I) D^-1/2
    np.testing.assert_allclose(a, a.T, atol=1e-6)
    assert (a >= 0).all()
    eigs = np.linalg.eigvalsh(a.astype(np.float64))
    assert eigs.max() <= 1.0 + 1e-5


def test_gcn_shapes():
    import jax

    g = graph_from_name("BA_32_ID0")
    a = jnp.asarray(normalized_adjacency(g))
    model = GCN(hidden=(16,), out_dim=3)
    x = jnp.ones((32, 5))
    params = model.init(jax.random.PRNGKey(0), x, a)
    out = model.apply(params, x, a)
    assert out.shape == (32, 3)
    # batched leading axis works too
    out_b = model.apply(params, jnp.ones((4, 32, 5)), a)
    assert out_b.shape == (4, 32, 3)

    ac = GCNActorCritic(hidden=(16, 16))
    p2 = ac.init(jax.random.PRNGKey(1), x, a)
    logits, value = ac.apply(p2, x, a)
    assert logits.shape == (32,) and value.shape == ()


def test_pignn_maxcut_beats_random():
    g = graph_from_name("BA_64_ID3")
    bits, val = solve_maxcut_pignn(g, small_cfg())
    assert bits.shape == (64,)
    assert val == obj_maxcut(bits, g)
    # must beat the expected random cut (= half total weight)
    assert val > 0.5 * g.total_weight


def test_pignn_mis_feasible():
    g = graph_from_name("ER_48_ID1")
    bits, val = solve_mis_pignn(g, small_cfg())
    # independent set: no edge inside the chosen set
    for a, b, _ in g.to_edge_list():
        assert not (bits[a] and bits[b])
    assert val == obj_maximum_independent_set(bits, g)
    assert val >= 1
