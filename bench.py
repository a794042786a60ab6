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
    from rlsolver_tpu.ops.pallas.mcpg_sweep import PackedSweepTables, mcpg_sweep_fused
    from rlsolver_tpu.ops.pallas.mh_sampler import mh_sample_fused
    from rlsolver_tpu.ops.reductions import update_xs_by_vs
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

    # ---- full-iteration metric: one complete MCPG round per jit call —
    # MH proposals (2 * change_times = 2 * N/10 rounds, `MCPG.py:100-102`)
    # + num_ls packed anti-majority sweeps + objective + elitist reduce.
    # Only the proposals count as env-steps; sweep/objective/reduce are the
    # honest pipeline overhead the headline metric amortizes away.
    proposal_rounds = 2 * (graph.num_nodes // 10)
    num_ls = 8
    tables = PackedSweepTables.build(graph)

    @jax.jit
    def full_iteration(seed, xs, best_xs, best_vs):
        mh = mh_sample_fused(seed, probs, xs, proposal_rounds, block_chains=2048)
        ls = mcpg_sweep_fused(
            seed + 1, mh, tables, num_sweeps=num_ls, block_chains=2048
        )
        vs = env.obj(ls)
        best_xs, best_vs = update_xs_by_vs(best_xs, best_vs, ls, vs)
        return ls, best_xs, best_vs

    best_xs, best_vs = xs, env.obj(xs)
    xs, best_xs, best_vs = full_iteration(jnp.int32(0), xs, best_xs, best_vs)
    best_vs.block_until_ready()
    full_calls = 16
    t0 = time.time()
    for i in range(full_calls):
        xs, best_xs, best_vs = full_iteration(jnp.int32(2 * i + 2), xs, best_xs, best_vs)
    float(best_vs[0])
    full_elapsed = time.time() - t0
    full_steps_per_sec = full_calls * proposal_rounds * num_envs / full_elapsed

    print(
        json.dumps(
            {
                "metric": "maxcut_env_steps_per_sec_per_chip_G22_8k_envs",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / 1e7, 4),
                "full_iteration_env_steps_per_sec": round(full_steps_per_sec, 1),
                "full_iteration_detail": (
                    f"{proposal_rounds} MH proposal rounds + {num_ls} packed "
                    "sweeps + objective + elitist reduce per jit call"
                ),
                "best_cut_after_bench": float(jnp.max(best_vs)),
            }
        )
    )


if __name__ == "__main__":
    main()
