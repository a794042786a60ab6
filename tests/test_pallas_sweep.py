"""Pallas 1-flip sweep kernel: bit-exact vs MaxcutEnv.sweep_1flip."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.envs.maxcut import MaxcutEnv
from rlsolver_tpu.ops import cut as cut_ops
from rlsolver_tpu.ops.pallas.sweep_kernel import sweep_1flip_pallas


def setup(name="BA_48_ID0", b=64):
    g = graph_from_name(name)
    env = MaxcutEnv(g, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    xs = env.random_xs(key, b)
    vs = env.obj(xs)
    return g, env, xs, vs


def test_pallas_sweep_bit_exact_vs_env():
    g, env, xs, vs = setup()
    adj = jnp.asarray(g.adjacency_dense())
    s = cut_ops.signs_from_bits(xs, jnp.float32)
    gains = env.gains(xs)
    s2, gains2, vs2 = sweep_1flip_pallas(
        adj, s, gains, vs, block_chains=32, interpret=True
    )
    xs_ref, vs_ref = env.sweep_1flip(xs, vs)
    np.testing.assert_array_equal(np.asarray(s2 > 0), np.asarray(xs_ref))
    np.testing.assert_allclose(np.asarray(vs2), np.asarray(vs_ref), atol=1e-4)
    # returned gains are consistent with a fresh computation
    np.testing.assert_allclose(
        np.asarray(gains2), np.asarray(env.gains(s2 > 0)), atol=1e-3
    )


def test_pallas_sweep_monotone_and_host_parity():
    from rlsolver_tpu.problems.objectives import obj_maxcut

    g, env, xs, vs = setup("ER_32_ID1", b=32)
    adj = jnp.asarray(g.adjacency_dense())
    s = cut_ops.signs_from_bits(xs, jnp.float32)
    gains = env.gains(xs)
    s2, _, vs2 = sweep_1flip_pallas(adj, s, gains, vs, block_chains=32, interpret=True)
    assert (np.asarray(vs2) >= np.asarray(vs) - 1e-5).all()
    for b in (0, 13, 31):
        assert float(vs2[b]) == obj_maxcut(np.asarray(s2[b] > 0).astype(int), g)
