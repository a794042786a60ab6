"""Bit-packed MCPG sweep kernel: bit-exact parity with the XLA twin
(interpret mode) and zero-noise equivalence with the production
`degree_ordered_sweep`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.ops.pallas.mcpg_sweep import (
    PackedSweepTables,
    mcpg_sweep_packed,
    mcpg_sweep_reference,
)
from rlsolver_tpu.ops.sweeps import SweepData, degree_ordered_sweep, mcpg_init_values


@pytest.fixture(scope="module", params=["BA_100_ID0", "ER_64_ID1"])
def setup(request):
    g = graph_from_name(request.param)
    return g, PackedSweepTables.build(g)


def test_packed_sweep_bit_exact_vs_twin(setup):
    g, tables = setup
    B, N, S = 128, g.num_nodes, 3
    bits = jax.random.bernoulli(jax.random.PRNGKey(0), 0.5, (B, N))
    noise = jax.random.randint(jax.random.PRNGKey(1), (S * N, B), 0, 65536, jnp.int32)
    ref = mcpg_sweep_reference(noise, bits, tables, g, num_sweeps=S)
    out = mcpg_sweep_packed(
        noise, bits, tables, num_sweeps=S, block_chains=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_twin_equals_xla_sweep_at_zero_noise(setup):
    # with zero noise every quantity is an exact f32 integer/half, so the
    # popcount formulation is provably identical to the gather formulation
    g, tables = setup
    B, N = 64, g.num_nodes
    bits = jax.random.bernoulli(jax.random.PRNGKey(2), 0.5, (B, N))
    zero = jnp.zeros((2 * N, B), jnp.int32)
    ref0 = mcpg_sweep_reference(zero, bits, tables, g, num_sweeps=2, noise_scale=0.0)
    data = SweepData.build(g)
    xt = degree_ordered_sweep(
        jax.random.PRNGKey(3), mcpg_init_values(bits), data, num_sweeps=2,
        noise_scale=0.0,
    )
    np.testing.assert_array_equal(np.asarray(ref0), np.asarray(xt[:, :N] > 0.5))


def test_sweep_improves_objective(setup):
    from rlsolver_tpu.envs.maxcut import MaxcutEnv

    g, tables = setup
    env = MaxcutEnv(g)
    B, N = 128, g.num_nodes
    bits = jax.random.bernoulli(jax.random.PRNGKey(4), 0.5, (B, N))
    noise = jax.random.randint(jax.random.PRNGKey(5), (2 * N, B), 0, 65536, jnp.int32)
    out = mcpg_sweep_packed(
        noise, bits, tables, num_sweeps=2, block_chains=128, interpret=True
    )
    assert float(jnp.mean(env.obj(out))) > float(jnp.mean(env.obj(bits)))


def test_weighted_graph_rejected():
    from rlsolver_tpu.core.graph import Graph

    g = Graph.from_edge_list(3, [(0, 1, 2.0), (1, 2, 1.0)], name="w")
    with pytest.raises(ValueError, match="unit-weight"):
        PackedSweepTables.build(g)


def _signed_graph():
    """BA_100 with a deterministic half of the edges flipped to weight -1
    (the G11/G12/G32-class +-1 Gset shape)."""
    from rlsolver_tpu.core.graph import Graph

    g = graph_from_name("BA_100_ID2")
    edges = [
        (a, b, -1.0 if (a + b) % 2 else 1.0) for a, b, _ in g.to_edge_list()
    ]
    return Graph.from_edge_list(g.num_nodes, edges, name="BA_100_pm1")


def test_signed_packed_sweep_bit_exact_vs_twin():
    g = _signed_graph()
    tables = PackedSweepTables.build(g)
    assert tables.signed
    B, N, S = 128, g.num_nodes, 3
    bits = jax.random.bernoulli(jax.random.PRNGKey(10), 0.5, (B, N))
    noise = jax.random.randint(jax.random.PRNGKey(11), (S * N, B), 0, 65536, jnp.int32)
    ref = mcpg_sweep_reference(noise, bits, tables, g, num_sweeps=S)
    out = mcpg_sweep_packed(
        noise, bits, tables, num_sweeps=S, block_chains=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_signed_twin_equals_xla_sweep_at_zero_noise():
    g = _signed_graph()
    tables = PackedSweepTables.build(g)
    B, N = 64, g.num_nodes
    bits = jax.random.bernoulli(jax.random.PRNGKey(12), 0.5, (B, N))
    zero = jnp.zeros((2 * N, B), jnp.int32)
    ref0 = mcpg_sweep_reference(zero, bits, tables, g, num_sweeps=2, noise_scale=0.0)
    data = SweepData.build(g)
    xt = degree_ordered_sweep(
        jax.random.PRNGKey(13), mcpg_init_values(bits), data, num_sweeps=2,
        noise_scale=0.0,
    )
    np.testing.assert_array_equal(np.asarray(ref0), np.asarray(xt[:, :N] > 0.5))


def test_signed_sweep_1flip_packed_bit_exact():
    from rlsolver_tpu.envs.maxcut import MaxcutEnv
    from rlsolver_tpu.ops.pallas.mcpg_sweep import pack_adjacency, sweep_1flip_packed

    g = _signed_graph()
    env = MaxcutEnv(g)
    adj = pack_adjacency(g)
    assert adj[1] is not None
    bits = jax.random.bernoulli(jax.random.PRNGKey(14), 0.5, (64, g.num_nodes))
    ref_bits, ref_vs = env.sweep_1flip(bits, env.obj(bits))
    out = sweep_1flip_packed(bits, adj, block_chains=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_bits))
    np.testing.assert_allclose(np.asarray(env.obj(out)), np.asarray(ref_vs))


def test_sweep_1flip_packed_bit_exact(setup):
    from rlsolver_tpu.envs.maxcut import MaxcutEnv
    from rlsolver_tpu.ops.pallas.mcpg_sweep import pack_adjacency, sweep_1flip_packed

    g, _ = setup
    env = MaxcutEnv(g)
    bits = jax.random.bernoulli(jax.random.PRNGKey(6), 0.5, (64, g.num_nodes))
    ref_bits, ref_vs = env.sweep_1flip(bits, env.obj(bits))
    out = sweep_1flip_packed(
        bits, pack_adjacency(g), block_chains=64, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_bits))
    np.testing.assert_allclose(np.asarray(env.obj(out)), np.asarray(ref_vs))
