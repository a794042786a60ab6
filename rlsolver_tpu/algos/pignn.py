"""PI-GNN: physics-inspired GNN trained on a relaxed QUBO Hamiltonian.

Reference counterpart (`rlsolver/methods/PIGNN/main.py:17-101`, model
`PIGNN/model.py:9-61`): a GCN outputs per-node probabilities p in (0, 1);
the loss is the continuous relaxation of the problem Hamiltonian; training
uses early stopping on the loss; the solution is the rounded p > 0.5.

Hamiltonians (standard PI-GNN formulations, matching the reference's eval
targets `eval_maxcut` / `eval_MIS` in `PIGNN/util.py`):
  maxcut: L = -sum_ij w_ij (p_i + p_j - 2 p_i p_j)   (negated expected cut)
  MIS:    L = -sum_i p_i + penalty * sum_ij A_ij p_i p_j
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.models.gcn import GCN, normalized_adjacency
from rlsolver_tpu.ops import cut as cut_ops


@dataclasses.dataclass
class PIGNNConfig:
    hidden: tuple = (64, 64)
    embed_dim: int = 16  # learnable node-id embedding input
    lr: float = 1e-3
    max_steps: int = 2000
    patience: int = 200  # early stopping (reference uses Lightning EarlyStopping)
    tol: float = 1e-5
    penalty: float = 2.0  # MIS constraint weight
    seed: int = 0


def _train(graph: Graph, loss_of_probs, cfg: PIGNNConfig):
    n = graph.num_nodes
    a_norm = jnp.asarray(normalized_adjacency(graph))
    model = GCN(hidden=cfg.hidden, out_dim=1)
    key = jax.random.PRNGKey(cfg.seed)
    k_emb, k_init = jax.random.split(key)
    node_embed = jax.random.normal(k_emb, (n, cfg.embed_dim)) * 0.1
    params = {"gcn": model.init(k_init, node_embed, a_norm), "embed": node_embed}
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p["gcn"], p["embed"], a_norm)[..., 0]
            probs = jax.nn.sigmoid(logits)
            return loss_of_probs(probs), probs

        (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, probs

    best_loss, best_probs, since_best = np.inf, None, 0
    for i in range(cfg.max_steps):
        params, opt_state, loss, probs = step(params, opt_state)
        loss = float(loss)
        if loss < best_loss - cfg.tol:
            best_loss, best_probs, since_best = loss, probs, 0
        else:
            since_best += 1
            if since_best >= cfg.patience:
                break
    return np.asarray(best_probs)


def solve_maxcut_pignn(
    graph: Graph, cfg: PIGNNConfig = PIGNNConfig()
) -> Tuple[np.ndarray, float]:
    e_n0, e_n1, e_w = graph.edge_arrays()
    n0, n1, w = jnp.asarray(e_n0), jnp.asarray(e_n1), jnp.asarray(e_w)

    def loss_of_probs(p):
        return -jnp.sum(w * (p[n0] + p[n1] - 2.0 * p[n0] * p[n1]))

    probs = _train(graph, loss_of_probs, cfg)
    bits = probs > 0.5
    cg = cut_ops.CutGraph.build(graph, dtype=jnp.float32)
    val = float(cut_ops.cut_dense(jnp.asarray(bits[None]), cg)[0])
    return bits, val


def solve_mis_pignn(
    graph: Graph, cfg: PIGNNConfig = PIGNNConfig()
) -> Tuple[np.ndarray, float]:
    e_n0, e_n1, _ = graph.edge_arrays()
    n0, n1 = jnp.asarray(e_n0), jnp.asarray(e_n1)

    def loss_of_probs(p):
        return -jnp.sum(p) + cfg.penalty * jnp.sum(p[n0] * p[n1])

    probs = _train(graph, loss_of_probs, cfg)
    bits = (probs > 0.5).copy()
    # repair any residual violations (drop the later endpoint), then make the
    # set maximal by greedily adding non-conflicting nodes in prob order
    for a, b in zip(e_n0, e_n1):
        if bits[a] and bits[b]:
            bits[b] = False
    nbrs, _, deg = graph.padded_neighbors()
    for v in np.argsort(-probs):
        if not bits[v] and not bits[nbrs[v, : deg[v]]].any():
            bits[v] = True
    return bits, float(bits.sum())
