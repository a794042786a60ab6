"""TNCO env: contraction-cost simulation, codecs, local search.

Slow twin: an independent python contraction simulator over explicit
cluster sets (the reference's de-facto test strategy, cf.
`TNCO_simulator.py:919-1190` unit_test_* fns comparing vectorized vs
vanilla paths).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.envs.tnco import (
    TensorNetwork,
    TncoEnv,
    random_circuit_nodes,
    tensor_ring_nodes,
    tensor_train_nodes,
    tensor_tree_nodes,
)


def python_contraction_log10(net: TensorNetwork, order):
    """Independent slow twin: clusters as frozensets, log2 dims as dicts.

    A cluster's open bonds = multiset of edges with exactly one endpoint in
    the cluster. Contracting edge (a, b) with clusters A != B costs
    2 ** (open(A) + open(B) - shared(A, B)) multiplications, where shared
    bonds are counted once.
    """
    parent = list(range(net.num_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pows = []
    for e in order:
        n0, n1 = net.edge_nodes[int(e)]
        r0, r1 = find(int(n0)), find(int(n1))
        if r0 == r1:
            # the reference records pow_count = 0 for already-merged edges,
            # which still contributes 2**0 = 1 to the total multiple count
            # (`get_multiple_times_vectorized` sums over all steps)
            pows.append(0)
            continue
        members0 = {i for i in range(net.num_nodes) if find(i) == r0}
        members1 = {i for i in range(net.num_nodes) if find(i) == r1}
        union = members0 | members1
        exponent = 0
        for a, b in net.edge_nodes:
            a, b = int(a), int(b)
            in0 = (a in union) + (b in union)
            if in0 == 1:
                exponent += 1  # open bond of the merged cluster
            elif in0 == 2 and not (
                (a in members0 and b in members0) or (a in members1 and b in members1)
            ):
                exponent += 1  # bond being contracted between the two clusters
        pows.append(exponent)
        parent[r1] = r0
    if not pows:
        return 0.0
    shift = max(pows)
    return math.log10(sum(2.0 ** (p - shift) for p in pows)) + shift * math.log10(2.0)


TOPOLOGIES = [
    tensor_train_nodes(5),
    tensor_ring_nodes(4),
    tensor_tree_nodes(3),
    random_circuit_nodes(4, 3, seed=1),
]


@pytest.mark.parametrize("nodes_list,ban_edges", TOPOLOGIES)
def test_ban_edges_numbered_last(nodes_list, ban_edges):
    net = TensorNetwork.from_nodes_list(nodes_list, ban_edges)
    # degree-1 leaf nodes (dangling legs) only touch the trailing edge ids
    deg = np.zeros(net.num_nodes, int)
    for a, b in net.edge_nodes:
        deg[a] += 1
        deg[b] += 1
    for e in range(net.run_edges, net.num_edges):
        a, b = net.edge_nodes[e]
        assert deg[a] == 1 or deg[b] == 1


def test_codec_roundtrip():
    net = TensorNetwork.from_nodes_list(*random_circuit_nodes(5, 4, seed=2))
    env = TncoEnv(net)
    sorts = env.random_edge_sorts(jax.random.PRNGKey(0), 7)
    bits = env.edge_sorts_to_bits(sorts)
    assert bits.shape == (7, env.num_bits)
    back = env.bits_to_edge_sorts(bits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(sorts))


@pytest.mark.parametrize("nodes_list,ban_edges", TOPOLOGIES)
def test_contraction_cost_matches_python_twin(nodes_list, ban_edges):
    net = TensorNetwork.from_nodes_list(nodes_list, ban_edges)
    env = TncoEnv(net)
    key = jax.random.PRNGKey(3)
    sorts = env.random_edge_sorts(key, 4)
    dev = np.asarray(env.log10_multiple_times(sorts))
    for i in range(4):
        ref = python_contraction_log10(net, np.asarray(sorts[i]))
        assert abs(dev[i] - ref) < 1e-4, (i, dev[i], ref)


def test_accurate_twin_close():
    net = TensorNetwork.from_nodes_list(*random_circuit_nodes(6, 4, seed=4))
    env = TncoEnv(net)
    sorts = env.random_edge_sorts(jax.random.PRNGKey(5), 3)
    fast = np.asarray(env.log10_multiple_times(sorts))
    acc = env.log10_multiple_times_accurate(sorts)
    np.testing.assert_allclose(fast, acc, atol=1e-4)


def test_obj_from_bits_matches_order_obj():
    net = TensorNetwork.from_nodes_list(*tensor_train_nodes(6))
    env = TncoEnv(net)
    sorts = env.random_edge_sorts(jax.random.PRNGKey(6), 5)
    v_direct = np.asarray(env.log10_multiple_times(sorts))
    v_bits = np.asarray(env.obj(env.edge_sorts_to_bits(sorts)))
    np.testing.assert_allclose(v_bits, v_direct, atol=1e-5)


def test_local_search_improves():
    net = TensorNetwork.from_nodes_list(*random_circuit_nodes(6, 5, seed=7))
    env = TncoEnv(net)
    key = jax.random.PRNGKey(8)
    sorts = env.random_edge_sorts(key, 16)
    fs = env.ranks_to_priorities(sorts)
    vs0 = env.obj_priorities(fs)
    fs1, vs1 = jax.jit(lambda k, f, v: env.local_search(k, f, v, num_iters=8))(
        key, fs, vs0
    )
    assert (np.asarray(vs1) <= np.asarray(vs0) + 1e-6).all()
    assert float(jnp.mean(vs1)) < float(jnp.mean(vs0))
    # vs stays consistent with a fresh evaluation
    np.testing.assert_allclose(
        np.asarray(env.obj_priorities(fs1)), np.asarray(vs1), atol=1e-5
    )


def test_duplicate_edge_in_order_costs_nothing():
    # contracting an edge whose endpoints are already merged is a no-op
    net = TensorNetwork.from_nodes_list(*tensor_ring_nodes(4))
    env = TncoEnv(net)
    base = env.random_edge_sorts(jax.random.PRNGKey(9), 1)
    # an order repeating edge 0 twice: pows at the second occurrence == 0
    order = jnp.asarray([[0, 0] + list(range(1, env.run_edges - 1))], jnp.int32)
    pows = np.asarray(env.contraction_pow_counts(order))[0]
    assert pows[1] == 0.0
