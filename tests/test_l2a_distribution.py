"""Distribution-wise dREINFORCE/L2A: fresh-graph training + validation."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.config import GraphType
from rlsolver_tpu.core.generate import generate_graph
from rlsolver_tpu.problems.objectives import obj_maxcut
from rlsolver_tpu.algos.l2a_distribution import (
    L2ADistConfig,
    _cut_value_adj,
    flip_gains_adj,
    pretrain_encoder_distribution,
    sweep_1flip_adj,
    train_l2a_distribution,
)


def small_cfg(**kw):
    d = dict(
        num_nodes=24, num_sims=32, num_repeats=2, top_k=6, seq_len=3,
        num_iters=4, embed_dim=16, num_heads=2, pretrain_steps=20,
        num_validation=3,
    )
    d.update(kw)
    return L2ADistConfig(**d)


def test_adjacency_arg_primitives_match_host():
    g = generate_graph(GraphType.BA, 20, seed=0)
    adj = jnp.asarray(g.adjacency_dense())
    rng = np.random.RandomState(0)
    xs = rng.rand(6, 20) < 0.5
    dev = np.asarray(_cut_value_adj(jnp.asarray(xs), adj))
    for b in range(6):
        assert abs(dev[b] - obj_maxcut(xs[b].astype(int), g)) < 1e-3
    # flip gain consistency: obj(flip(x, i)) - obj(x) == gain[i]
    gains = np.asarray(flip_gains_adj(jnp.asarray(xs), adj))
    for b in range(3):
        for i in (0, 7, 19):
            flipped = xs[b].copy()
            flipped[i] = ~flipped[i]
            delta = obj_maxcut(flipped.astype(int), g) - obj_maxcut(xs[b].astype(int), g)
            assert abs(delta - gains[b, i]) < 1e-3


def test_sweep_adj_monotone():
    g = generate_graph(GraphType.ER, 20, seed=1)
    adj = jnp.asarray(g.adjacency_dense())
    xs = jax.random.bernoulli(jax.random.PRNGKey(0), 0.5, (16, 20))
    v0 = _cut_value_adj(xs, adj)
    out = jax.jit(lambda x: sweep_1flip_adj(x, adj))(xs)
    v1 = _cut_value_adj(out, adj)
    assert (np.asarray(v1) >= np.asarray(v0) - 1e-5).all()


def test_pretrain_reduces_reconstruction_loss():
    _, _, losses = pretrain_encoder_distribution(small_cfg(pretrain_steps=30))
    assert losses[-1] < losses[0]


def test_distribution_training_no_recompile_and_validates():
    cfg = small_cfg()
    bundle = train_l2a_distribution(cfg)
    history = bundle["history"]
    assert len(history) == cfg.num_iters
    assert np.isfinite([h["loss"] for h in history]).all()
    score = bundle["validate"](bundle["params"])
    # each validation instance: best over 32 sims after guided improvement
    # must beat the random expectation (half total weight)
    mean_half = np.mean(
        [
            0.5 * generate_graph(cfg.graph_type, cfg.num_nodes, seed=77_000 + v).total_weight
            for v in range(cfg.num_validation)
        ]
    )
    assert score > mean_half


def test_evaluate_l2a_packed_xla_twin_beats_greedy():
    """The policy-guided packed-search evaluator (CPU: XLA sweep twin) must
    improve monotonically past the greedy baseline on small instances."""
    from rlsolver_tpu.algos.l2a_distribution import evaluate_l2a_packed
    from rlsolver_tpu.classical.greedy import greedy_maxcut

    cfg = small_cfg(num_nodes=32, num_iters=3)
    bundle = train_l2a_distribution(cfg)
    gs = [generate_graph(GraphType.BA, 32, seed=s) for s in (0, 1)]
    vals = evaluate_l2a_packed(
        bundle, gs, num_rounds=16, num_sims=32, num_repeats=4, num_sweeps=2
    )
    for g, v in zip(gs, vals):
        assert v >= greedy_maxcut(g)[1] - 1e-6


def test_guided_block_compile_shared_across_instances():
    """Per-instance data rides as jit arguments: evaluating two same-shape
    instances must not retrace `_guided_block`."""
    from rlsolver_tpu.algos.l2a_distribution import _guided_block, evaluate_l2a_packed

    cfg = small_cfg(num_nodes=24, num_iters=2)
    bundle = train_l2a_distribution(cfg)
    gs = [generate_graph(GraphType.BA, 24, seed=s) for s in (3, 4, 5)]
    before = _guided_block._cache_size()
    evaluate_l2a_packed(
        bundle, gs, num_rounds=8, num_sims=16, num_repeats=2, num_sweeps=1
    )
    assert _guided_block._cache_size() - before == 1
