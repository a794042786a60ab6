"""TNCO solvers: local search, MCPG, and the mesh-sharded variant."""

import jax
import numpy as np

from rlsolver_tpu.envs.tnco import TensorNetwork, TncoEnv, random_circuit_nodes, tensor_train_nodes
from rlsolver_tpu.algos.tnco_solver import (
    TncoMcpgConfig,
    TncoSearchConfig,
    solve_tnco_local_search,
    solve_tnco_mcpg,
    solve_tnco_mcpg_sharded,
)
from rlsolver_tpu.parallel.mesh import make_mesh


def small_env():
    return TncoEnv(TensorNetwork.from_nodes_list(*random_circuit_nodes(5, 4, seed=0)))


def test_local_search_solver_improves():
    env = small_env()
    order, cost, history = solve_tnco_local_search(
        env, TncoSearchConfig(num_chains=32, num_rounds=10, seed=0)
    )
    assert sorted(order.tolist()) == list(range(env.run_edges))
    # history monotone non-increasing, final = returned cost
    assert all(history[i + 1] <= history[i] + 1e-6 for i in range(len(history) - 1))
    assert abs(history[-1] - cost) < 1e-5
    # beats the mean random ordering
    rnd = env.log10_multiple_times(env.random_edge_sorts(jax.random.PRNGKey(7), 32))
    assert cost < float(np.asarray(rnd).mean())


def test_mcpg_solver_runs_and_beats_random():
    env = small_env()
    order, cost, history = solve_tnco_mcpg(
        env, TncoMcpgConfig(num_chains=16, repeat_times=2, num_rounds=8, mh_rounds=32)
    )
    assert sorted(order.tolist()) == list(range(env.run_edges))
    assert np.isfinite(history).all()
    rnd = env.log10_multiple_times(env.random_edge_sorts(jax.random.PRNGKey(8), 64))
    assert cost <= float(np.asarray(rnd).min()) + 0.5


def test_mcpg_sharded_matches_api():
    env = TncoEnv(TensorNetwork.from_nodes_list(*tensor_train_nodes(6)))
    mesh = make_mesh(8)
    order, cost, history = solve_tnco_mcpg_sharded(
        env,
        mesh,
        TncoMcpgConfig(num_chains=16, repeat_times=2, num_rounds=5, mh_rounds=16),
    )
    assert sorted(order.tolist()) == list(range(env.run_edges))
    assert np.isfinite(cost)
    # best-so-far is monotone
    assert all(history[i + 1] <= history[i] + 1e-6 for i in range(len(history) - 1))
