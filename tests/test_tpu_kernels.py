"""Hardware lane for the fused Pallas kernels (the bench path).

Round-1 gap: `mh_sample_fused` / `mcpg_sweep_fused` (on-core PRNG) are
TPU-only and the CPU suite never exercised the exact code that produces
BENCH_r*.json. These tests run on the real chip:

    RLSOLVER_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

mirroring the reference's dual-implementation discipline
(`rlsolver/envs/env_L2A.py:54/68`): every kernel output is re-scored or
distribution-checked against the slow XLA twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def g22like():
    import networkx as nx

    from rlsolver_tpu.core.graph import Graph

    g = nx.gnm_random_graph(2000, 19990, seed=22)
    return Graph.from_edge_list(2000, [(a, b, 1.0) for a, b in g.edges], name="G22like")


def test_mh_sample_fused_stationary_distribution():
    """Long-run per-site empirical frequencies match the target Bernoulli
    product measure (chi-square-style tolerance over 2048 chains)."""
    from rlsolver_tpu.ops.pallas.mh_sampler import mh_sample_fused

    n, chains, rounds = 256, 2048, 4096
    key = jax.random.PRNGKey(0)
    probs = jax.random.uniform(key, (n,), minval=0.2, maxval=0.8)
    bits = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5, (chains, n))
    out = mh_sample_fused(jnp.int32(7), probs, bits, rounds, block_chains=512)
    freq = np.asarray(out.astype(jnp.float32).mean(axis=0))
    p = np.asarray(probs)
    # binomial std per site ~ sqrt(p(1-p)/chains) <= 0.011; allow 5 sigma
    # plus mixing slack (each site gets ~ rounds/n = 16 proposals)
    err = np.abs(freq - p)
    assert err.mean() < 0.03
    assert err.max() < 0.15
    # chi-square statistic per site ~ 1 on average under H0
    chi = ((freq - p) ** 2 * chains / (p * (1 - p))).mean()
    assert chi < 5.0


def test_mcpg_sweep_fused_improves_and_rescoring_matches(g22like):
    """Fused sweep outputs re-scored by the env objective: cuts are exact
    integers, and sweeping never lowers a chain's cut."""
    from rlsolver_tpu.envs.maxcut import MaxcutEnv
    from rlsolver_tpu.ops.pallas.mcpg_sweep import PackedSweepTables, mcpg_sweep_fused

    env = MaxcutEnv(g22like)
    tables = PackedSweepTables.build(g22like)
    key = jax.random.PRNGKey(1)
    bits = jax.random.bernoulli(key, 0.5, (512, g22like.num_nodes))
    before = env.obj(bits)
    out = mcpg_sweep_fused(jnp.int32(3), bits, tables, num_sweeps=4, block_chains=512)
    after = env.obj(out)
    after_np = np.asarray(after)
    assert np.all(after_np == np.round(after_np))  # integral cuts
    assert np.all(after_np >= np.asarray(before) - 1e-6)  # monotone
    # the sweep is a real local search, not a no-op
    assert after_np.mean() > np.asarray(before).mean() + 100


def test_sweep_1flip_packed_bit_exact_at_g22_scale(g22like):
    """Packed greedy 1-flip sweep is bit-identical to the f32
    incremental-gain sweep (`MaxcutEnv.sweep_1flip`) at G22 scale."""
    from rlsolver_tpu.envs.maxcut import MaxcutEnv
    from rlsolver_tpu.ops.pallas.mcpg_sweep import pack_adjacency, sweep_1flip_packed

    env = MaxcutEnv(g22like)
    packed = pack_adjacency(g22like)
    key = jax.random.PRNGKey(2)
    bits = jax.random.bernoulli(key, 0.5, (512, g22like.num_nodes))
    vs = env.obj(bits)
    ref_bits, ref_vs = jax.jit(env.sweep_1flip)(bits, vs)
    fast_bits = sweep_1flip_packed(bits, packed, block_chains=512)
    np.testing.assert_array_equal(np.asarray(fast_bits), np.asarray(ref_bits))
    np.testing.assert_allclose(
        np.asarray(env.obj(fast_bits)), np.asarray(ref_vs), rtol=0, atol=0
    )


def test_mh_fused_then_sweep_matches_env_objective(g22like):
    """End-to-end bench path (MH proposals -> packed sweep -> objective):
    the objective of the returned states equals an independent re-score."""
    from rlsolver_tpu.envs.maxcut import MaxcutEnv
    from rlsolver_tpu.ops.pallas.mcpg_sweep import PackedSweepTables, mcpg_sweep_fused
    from rlsolver_tpu.ops.pallas.mh_sampler import mh_sample_fused
    from rlsolver_tpu.problems.objectives import obj_maxcut

    env = MaxcutEnv(g22like)
    tables = PackedSweepTables.build(g22like)
    key = jax.random.PRNGKey(3)
    probs = jnp.full((g22like.num_nodes,), 0.5, jnp.float32)
    bits = jax.random.bernoulli(key, 0.5, (512, g22like.num_nodes))
    mh = mh_sample_fused(jnp.int32(11), probs, bits, 400, block_chains=512)
    out = mcpg_sweep_fused(jnp.int32(13), mh, tables, num_sweeps=2, block_chains=512)
    vs = np.asarray(env.obj(out))
    # independent slow re-score of a few rows via the host oracle
    rows = np.asarray(out[:4])
    for i in range(4):
        assert vs[i] == pytest.approx(obj_maxcut(rows[i], g22like))


def test_weighted_sweep_kernels_on_chip():
    """General-integer-weight bit-plane kernels (ops/pallas/weighted_sweep.py)
    on the real TPU: bit-exact vs the XLA twin / env sweep, and the fused
    on-core-PRNG variant's outputs re-score correctly and improve cuts."""
    from rlsolver_tpu.core.graph import Graph
    from rlsolver_tpu.envs.maxcut import MaxcutEnv
    from rlsolver_tpu.ops.pallas.mcpg_sweep import mcpg_sweep_reference
    from rlsolver_tpu.ops.pallas.weighted_sweep import (
        WeightedAdjPlanes,
        WeightedSweepTables,
        mcpg_sweep_weighted,
        mcpg_sweep_weighted_fused,
        sweep_1flip_weighted,
    )

    rng = np.random.default_rng(0)
    n = 2000
    edges = []
    for i in range(n):
        for j in rng.choice(n, 10, replace=False):
            if i < j:
                w = int(rng.integers(1, 8)) * (1 if rng.random() < 0.7 else -1)
                edges.append((i, int(j), float(w)))
    g = Graph.from_edge_list(n, edges, name="W2000")
    t = WeightedSweepTables.build(g)
    assert len(t.planes_pos) == 3 and len(t.planes_neg) == 3

    b = 512
    key = jax.random.PRNGKey(1)
    bits = jax.random.bernoulli(key, 0.5, (b, n))
    noise = jax.random.randint(jax.random.fold_in(key, 2), (2 * n, b), 0, 65536)
    out = mcpg_sweep_weighted(noise, bits, t, num_sweeps=2, block_chains=b)
    ref = mcpg_sweep_reference(noise, bits, t, g, num_sweeps=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    env = MaxcutEnv(g, dtype=jnp.float32)
    planes = WeightedAdjPlanes.build(g)
    vs = env.obj(bits)
    out1 = sweep_1flip_weighted(bits, planes, block_chains=b)
    xs_ref, _ = env.sweep_1flip(bits, vs)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(xs_ref))

    fused = mcpg_sweep_weighted_fused(jnp.int32(7), bits, t, num_sweeps=2,
                                      block_chains=b)
    v_f = np.asarray(env.obj(fused))
    assert v_f.mean() > np.asarray(vs).mean()


def test_mh_fused_wide_node_path_at_40k_nodes():
    """N > 32768 takes the wide (word, bitpos)-split node derivation
    (`mh_sampler.py:_mh_fused_kernel` wide branch). Addressing check: with
    probs = 1 every proposal to a real 0-bit flips it up and never down, so
    after ~100 expected hits per node the per-node OR over chains must be
    all-ones (every one of the 40000 nodes is reachable), and per-node hit
    frequencies are uniform; probs = 0 is the mirror image."""
    from rlsolver_tpu.ops.pallas.mh_sampler import mh_sample_fused

    n, chains, rounds = 40000, 1024, 4096
    ones = jnp.ones((n,), jnp.float32)
    zeros_bits = jnp.zeros((chains, n), bool)
    out = mh_sample_fused(jnp.int32(5), ones, zeros_bits, rounds,
                          block_chains=512)
    hit = np.asarray(out)
    # every node proposed by >= 1 of the 4.2M proposals (P(miss) ~ e^-100)
    assert hit.any(axis=0).all()
    freq = hit.mean(axis=0)  # per-node coverage, uniform across nodes
    assert abs(freq.mean() - freq[: n // 2].mean()) < 0.02
    assert freq.min() > 0.0

    out0 = mh_sample_fused(
        jnp.int32(6), 1.0 - ones, ~zeros_bits, rounds, block_chains=512
    )
    assert not np.asarray(out0).all(axis=0).any()


def test_mh_stream_bit_exact_vs_xla_twin_at_40k_nodes():
    """Injected-randomness packed sampler at N = 40000 on the chip is
    bit-exact vs the XLA scan twin (the CI contract, now held above the old
    32768-node fused cap)."""
    from rlsolver_tpu.ops.pallas.mh_sampler import (
        mh_reference_stream,
        mh_sample_stream,
    )

    n, chains, rounds = 40000, 256, 128
    key = jax.random.PRNGKey(9)
    probs = jax.random.uniform(key, (n,), minval=0.1, maxval=0.9)
    bits = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5, (chains, n))
    out = mh_sample_stream(key, probs, bits, rounds, block_chains=256)
    ref = mh_reference_stream(key, probs, bits, rounds)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
