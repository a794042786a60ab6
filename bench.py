"""Benchmark: maxcut env-steps/s per chip on a G22-sized instance.

Workload (matches BASELINE.json config 2): 8192 parallel Pattern-II QUBO
envs on a 2000-node / 19990-edge Gset-class graph, running the policy-
targeted random-flip MCMC rollout (MCPG's `metro_sampling` semantics) as
the bit-packed Pallas kernel with on-core PRNG
(`ops/pallas/mh_sampler.py:mh_sample_fused`), with a full objective
evaluation per jit call. One env-step = one MCMC proposal round applied to
one env.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N/1e7}
vs_baseline is relative to the 10M steps/s/chip north star (BASELINE.md #5).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_g22_like():
    """Seeded stand-in for Gset G22 (2000 nodes, 19990 edges, unit weights).

    The reference repo ships only a toy gset file, so the benchmark instance
    is a seeded G(n, m) random graph with G22's exact size/density.
    """
    import networkx as nx

    from rlsolver_tpu.core.graph import Graph

    g = nx.gnm_random_graph(2000, 19990, seed=22)
    return Graph.from_edge_list(2000, [(a, b, 1.0) for a, b in g.edges], name="G22like")


def main():
    from rlsolver_tpu.envs.maxcut import MaxcutEnv
    from rlsolver_tpu.ops.pallas.mh_sampler import mh_sample_fused
    from rlsolver_tpu.problems.objectives import obj_maxcut

    num_envs = 8192
    rounds_per_call = 1024  # fused MCMC proposal rounds per jit call

    graph = build_g22_like()
    env = MaxcutEnv(graph)
    key = jax.random.PRNGKey(0)
    xs = env.random_xs(key, num_envs)
    probs = jnp.full((graph.num_nodes,), 0.5, jnp.float32)

    @jax.jit
    def rollout(seed, xs):
        # bit-packed MH kernel with on-core PRNG (ops/pallas/mh_sampler.py)
        xs = mh_sample_fused(seed, probs, xs, rounds_per_call, block_chains=2048)
        vs = env.obj(xs)
        return xs, vs

    # Warmup / compile.
    xs, vs = rollout(jnp.int32(0), xs)
    vs.block_until_ready()

    # Correctness guard: device objective == host objective on one sample.
    host_v = obj_maxcut(np.asarray(xs[0]).astype(int), graph)
    assert float(vs[0]) == host_v, f"objective mismatch {float(vs[0])} != {host_v}"

    # Timed steady-state (calls are chained through xs; the final scalar
    # read below forces execution of the whole chain).
    num_calls = 32
    t0 = time.time()
    for i in range(num_calls):
        xs, vs = rollout(jnp.int32(i + 1), xs)
    float(vs[0])
    elapsed = time.time() - t0

    env_steps = num_calls * rounds_per_call * num_envs
    steps_per_sec = env_steps / elapsed
    print(
        json.dumps(
            {
                "metric": "maxcut_env_steps_per_sec_per_chip_G22_8k_envs",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / 1e7, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
