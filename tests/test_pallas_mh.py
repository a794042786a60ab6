"""Pallas MH sampler: bit-exact parity with the XLA twin (interpret mode)
and distributional correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.ops.pallas.mh_sampler import (
    make_round_randoms,
    make_proposal_stream,
    mh_reference,
    mh_reference_stream,
    mh_sample_packed,
    mh_sample_pallas,
    mh_sample_stream,
    pack_bits,
    unpack_bits,
)


def test_pallas_bit_exact_vs_xla_twin():
    key = jax.random.PRNGKey(0)
    probs = jax.random.uniform(jax.random.fold_in(key, 1), (24,), minval=0.2, maxval=0.8)
    bits = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5, (256, 24))
    out_pallas = mh_sample_pallas(
        key, probs, bits, num_rounds=64, block_chains=128, interpret=True
    )
    out_xla = mh_reference(key, probs, bits, num_rounds=64)
    np.testing.assert_array_equal(np.asarray(out_pallas), np.asarray(out_xla))


def test_pallas_mh_stationary_distribution():
    # single-site MH with accept (1-q)/q, q = P(current value), satisfies
    # detailed balance for pi(1) = p: the chain samples toward the policy
    probs = jnp.asarray([0.3, 0.5, 0.7, 0.4, 0.6, 0.5, 0.2, 0.8])
    bits = jax.random.bernoulli(jax.random.PRNGKey(3), 0.5, (512, 8))
    out = mh_sample_pallas(
        jax.random.PRNGKey(4), probs, bits, num_rounds=768,
        block_chains=128, interpret=True,
    )
    mean = np.asarray(out).mean(axis=0)
    np.testing.assert_allclose(mean, np.asarray(probs), atol=0.08)


def test_pack_unpack_roundtrip():
    for n in (1, 31, 32, 33, 300, 2000):
        bits = jax.random.bernoulli(jax.random.PRNGKey(n), 0.5, (16, n))
        words = pack_bits(bits)
        assert words.shape == (16, (n + 31) // 32)
        np.testing.assert_array_equal(np.asarray(unpack_bits(words, n)), np.asarray(bits))


def test_pack_unpack_chunked_nondivisor_batch(monkeypatch):
    # Batch sizes with no divisor <= the codec chunk (e.g. prime B just
    # above it) must pad to a chunk multiple, not degrade to per-row maps.
    from rlsolver_tpu.ops.pallas import mh_sampler as mh

    monkeypatch.setattr(mh, "_CODEC_CHUNK", 8)
    for b in (11, 13, 17):  # primes > chunk
        bits = jax.random.bernoulli(jax.random.PRNGKey(b), 0.5, (b, 70))
        words = mh.pack_bits(bits)
        assert words.shape == (b, 3)
        np.testing.assert_array_equal(
            np.asarray(mh.unpack_bits(words, 70)), np.asarray(bits)
        )


def test_packed_bit_exact_vs_xla_twin():
    key = jax.random.PRNGKey(11)
    # N spanning multiple words, including the bitpos=31 sign-bit edge
    probs = jax.random.uniform(jax.random.fold_in(key, 1), (71,), minval=0.1, maxval=0.9)
    bits = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5, (256, 71))
    out_packed = mh_sample_packed(
        key, probs, bits, num_rounds=128, block_chains=128, interpret=True
    )
    out_xla = mh_reference(key, probs, bits, num_rounds=128)
    np.testing.assert_array_equal(np.asarray(out_packed), np.asarray(out_xla))


def test_stream_bit_exact_vs_xla_twin():
    key = jax.random.PRNGKey(21)
    probs = jax.random.uniform(jax.random.fold_in(key, 1), (97,), minval=0.05, maxval=0.95)
    bits = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5, (512, 97))
    out = mh_sample_stream(key, probs, bits, num_rounds=128, interpret=True)
    ref = mh_reference_stream(key, probs, bits, num_rounds=128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_stream_stationary_distribution():
    # quantized (u16) accept tables + fixed-point site pick must still target
    # Bernoulli(probs): site choice is state-independent so any selection
    # distribution preserves the product stationary measure
    probs = jnp.asarray([0.3, 0.5, 0.7, 0.4, 0.6, 0.5, 0.2, 0.8])
    bits = jax.random.bernoulli(jax.random.PRNGKey(3), 0.5, (2048, 8))
    out = mh_reference_stream(jax.random.PRNGKey(4), probs, bits, 512)
    np.testing.assert_allclose(
        np.asarray(out).mean(axis=0), np.asarray(probs), atol=0.06
    )


def test_proposal_stream_packing():
    probs = jnp.full((70,), 0.5)
    stream = make_proposal_stream(jax.random.PRNGKey(5), 16, 64, probs)
    s = np.asarray(stream)
    word = s >> 7
    bitpos = (s >> 2) & 31
    node = (word << 5) | bitpos
    assert (node >= 0).all() and (node < 70).all()
    assert ((s & 3) <= 3).all()


def test_round_randoms_shapes():
    nodes, u = make_round_randoms(jax.random.PRNGKey(5), 10, 32, 7)
    assert nodes.shape == (10, 32) and u.shape == (10, 32)
    assert int(nodes.min()) >= 0 and int(nodes.max()) < 7
    assert float(u.min()) >= 0.0 and float(u.max()) < 1.0


def test_determinism_and_seed_sensitivity():
    probs = jnp.full((16,), 0.5)
    bits = jax.random.bernoulli(jax.random.PRNGKey(6), 0.5, (128, 16))
    a = mh_sample_pallas(jax.random.PRNGKey(7), probs, bits, 32, 128, interpret=True)
    b = mh_sample_pallas(jax.random.PRNGKey(7), probs, bits, 32, 128, interpret=True)
    c = mh_sample_pallas(jax.random.PRNGKey(8), probs, bits, 32, 128, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) != np.asarray(c)).any()
