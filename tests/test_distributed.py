"""2-D (host x device) mesh helpers on the simulated 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.envs.maxcut import MaxcutEnv
from rlsolver_tpu.parallel.distributed import (
    env_sharding_2d,
    initialize_multihost,
    make_host_device_mesh,
    pmax_all,
    pmean_all,
    psum_all,
    shard_rollout_2d,
)


def test_initialize_noop_single_process():
    assert initialize_multihost() is False  # single process: no-op
    assert jax.process_count() == 1


def test_mesh_shape_and_axes():
    mesh = make_host_device_mesh(num_hosts=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("host", "device")


def test_collectives_over_both_axes():
    mesh = make_host_device_mesh(num_hosts=2)
    x = jnp.arange(8.0)

    def body(shard):
        # shard is [1] per device; psum over both axes = global sum
        return jnp.full_like(shard, psum_all(shard.sum()))

    out = shard_rollout_2d(mesh, body)(x)
    np.testing.assert_allclose(np.asarray(out), np.full(8, 28.0))


def test_sharded_env_rollout_2d():
    """Env batch sharded over (host, device); global best via pmax."""
    g = graph_from_name("BA_24_ID0")
    env = MaxcutEnv(g)
    mesh = make_host_device_mesh(num_hosts=2)
    xs = env.random_xs(jax.random.PRNGKey(0), 32)  # 4 envs per device
    xs = jax.device_put(xs, env_sharding_2d(mesh))

    def rollout(xs):
        vs = env.obj(xs)
        best = pmax_all(jnp.max(vs))
        mean = pmean_all(jnp.mean(vs))
        return jnp.broadcast_to(best - mean, (xs.shape[0],))

    out = shard_rollout_2d(mesh, rollout)(xs)
    # every shard agrees on the global (best - mean)
    vals = np.asarray(out)
    np.testing.assert_allclose(vals, vals[0], atol=1e-5)
    # cross-check against the unsharded computation
    vs = np.asarray(env.obj(jax.device_put(xs, jax.devices()[0])))
    np.testing.assert_allclose(vals[0], vs.max() - vs.mean(), atol=1e-4)
