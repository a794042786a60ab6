"""MCPG: Monte Carlo Policy Gradient for QUBO-style problems (Pattern II).

Capability-parity rebuild of the reference MCPG maxcut solver
(`rlsolver/methods/MCPG.py:322-457`), as three fused jitted programs:

  1. sample:  policy-targeted Metropolis bit-flip chains
              (`metro_sampling`, MCPG.py:88-118) over
              total_mcmc_num * repeat_times chains, followed by `num_ls`
              degree-ordered local-search sweeps (`sampler_func`,
              MCPG.py:120-166) and the per-chain best-of-repeats reduction;
  2. elitist: per-chain incumbent update + worst-chain replacement by the
              global best (MCPG.py:376-394);
  3. update:  REINFORCE on the *pre-local-search* samples with the
              (local-searched) advantage value (`get_return`,
              MCPG.py:292-302), Adam + grad clip 1.0.

Chain layout is flat [repeat_times * total_mcmc_num, N] with repeat r of
chain c at row r * C + c (matching `pick_xs_by_vs` layout).
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.core.result import write_graph_result
from rlsolver_tpu.envs.maxcut import MaxcutEnv
from rlsolver_tpu.eval.evaluator import Evaluator
from rlsolver_tpu.models.policy import BernoulliPolicy
from rlsolver_tpu.ops.reductions import pick_xs_by_vs, update_xs_by_vs
from rlsolver_tpu.ops.sampling import bernoulli_logp, metropolis_bitflip_chain
from rlsolver_tpu.ops.sweeps import (
    SweepData,
    colored_sweep,
    degree_ordered_sweep,
    mcpg_init_values,
)


@dataclasses.dataclass
class MCPGConfig:
    total_mcmc_num: int = 256  # parallel chains C
    repeat_times: int = 32  # repeats R per chain
    num_ls: int = 8  # local-search sweeps per sample round
    max_epoch_num: int = 3
    reset_epoch_num: int = 64  # sample rounds per epoch ~ reset/sample
    sample_epoch_num: int = 8  # SGD steps per sample round
    lr: float = 8e-2
    change_times: Optional[int] = None  # MH accept budget per chain; default N/10
    warmup_ls_rounds: int = 4  # incumbent warm start via parallel local search
    seed: int = 0
    sweep_mode: str = "sequential"  # "sequential" (parity) | "colored" (MXU)
    # | "packed" (bit-packed Pallas kernel with on-core PRNG; TPU-only,
    #   {0, +-1}-weight graphs — ~941M node-updates/s at G22-class shapes)
    sampler: str = "budgeted"  # "budgeted" (reference-parity accept budget) |
    # "fused" (bit-packed Pallas kernel with on-core PRNG, TPU-only; runs a
    # fixed 2 * change_times proposal rounds instead of the accept budget)


# Per-instance tuned presets (reference `MCPG.py:41-84`). The reference's
# repeat_times target a 40 GB A100; a v5e chip has 16 GB of HBM and the
# live set is ~4 bool [B, N] population copies + one f32 [B, N] objective
# intermediate (~10 bytes/chain-bit), so repeats here keep
# B * N = chains * repeats * nodes under ~10^9. Chain counts match the
# reference; quality comes from epochs rather than population width.
GSET_PRESETS = {
    "gset_14": MCPGConfig(total_mcmc_num=512, repeat_times=128, num_ls=8,
                          reset_epoch_num=128, max_epoch_num=30),
    "gset_22": MCPGConfig(total_mcmc_num=2048, repeat_times=224, num_ls=8,
                          reset_epoch_num=256, max_epoch_num=30),
    "gset_55": MCPGConfig(total_mcmc_num=1024, repeat_times=192, num_ls=8,
                          reset_epoch_num=192, max_epoch_num=30),
    "gset_70": MCPGConfig(total_mcmc_num=768, repeat_times=96, num_ls=8,
                          reset_epoch_num=320, max_epoch_num=30),
}

# The reference's 40 GB-GPU repeat counts (`MCPG.py:49-84`), for parity
# documentation and larger-HBM deployments.
GSET_PRESETS_40G = {
    "gset_14": GSET_PRESETS["gset_14"],
    "gset_22": dataclasses.replace(GSET_PRESETS["gset_22"], repeat_times=512),
    "gset_55": dataclasses.replace(GSET_PRESETS["gset_55"], repeat_times=448),
    "gset_70": dataclasses.replace(GSET_PRESETS["gset_70"], repeat_times=288),
}


def preset_for(instance_name: str) -> MCPGConfig:
    """Tuned config for a gset instance; default config otherwise."""
    for key, cfg in GSET_PRESETS.items():
        if key in instance_name:
            return cfg
    return MCPGConfig()


class MCPGState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    key: jax.Array
    best_xs: jax.Array  # [C, N] per-chain incumbents
    best_vs: jax.Array  # [C] per-chain incumbent cuts


def _build_steps(env: MaxcutEnv, data: SweepData, cfg: MCPGConfig):
    num_nodes = env.num_nodes
    C, R = cfg.total_mcmc_num, cfg.repeat_times
    change_times = cfg.change_times or max(1, num_nodes // 10)
    policy = BernoulliPolicy(num_nodes)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(cfg.lr))
    if cfg.sweep_mode == "packed":
        from rlsolver_tpu.ops.pallas.mcpg_sweep import PackedSweepTables
        from rlsolver_tpu.ops.pallas.weighted_sweep import (
            WeightedSweepTables,
            pick_node_chunk,
            resident_masks_fit,
        )

        blk_static = 512 if (C * R) % 512 == 0 else C * R
        packed_chunk = None
        try:
            packed_tables = PackedSweepTables.build(env.graph)
            packed_weighted = False
            n_masks = 6 if packed_tables.signed else 3
            if not resident_masks_fit(
                packed_tables.num_nodes, packed_tables.wpad, n_masks, blk_static
            ):
                raise ValueError("dedicated-kernel masks exceed VMEM")
        except ValueError:
            # general integer weights, or G55/G70-scale instances whose mask
            # tables must be streamed: bit-plane kernel (weighted_sweep.py)
            packed_tables = WeightedSweepTables.build(env.graph)
            packed_weighted = True
            n_masks = 1 + len(packed_tables.planes_pos) * (
                2 if packed_tables.planes_neg else 1
            )
            packed_chunk = pick_node_chunk(
                packed_tables.num_nodes, packed_tables.wpad, n_masks, blk_static
            )

    def sample_step(key, probs, start_bits):
        """start_bits bool [R*C, N] -> (mh_samples, ls_bits, cuts [R*C])."""
        k_mh, k_ls = jax.random.split(key)
        if cfg.sampler == "fused":
            from rlsolver_tpu.ops.pallas.mh_sampler import mh_sample_fused

            seed = jax.random.randint(k_mh, (), 0, jnp.iinfo(jnp.int32).max)
            rounds = max(cfg.num_ls, 2 * change_times)
            blk = 512 if start_bits.shape[0] % 512 == 0 else start_bits.shape[0]
            mh = mh_sample_fused(seed, probs, start_bits, rounds, block_chains=blk)
        else:
            mh = metropolis_bitflip_chain(k_mh, probs, start_bits, change_times).samples
        if cfg.sweep_mode == "packed":
            from rlsolver_tpu.ops.pallas.mcpg_sweep import mcpg_sweep_fused
            from rlsolver_tpu.ops.pallas.weighted_sweep import (
                mcpg_sweep_weighted_fused,
            )

            seed = jax.random.randint(k_ls, (), 0, jnp.iinfo(jnp.int32).max)
            blk = 512 if mh.shape[0] % 512 == 0 else mh.shape[0]
            if packed_weighted:
                ls_bits = mcpg_sweep_weighted_fused(
                    seed, mh, packed_tables, num_sweeps=cfg.num_ls,
                    block_chains=blk, node_chunk=packed_chunk,
                )
            else:
                ls_bits = mcpg_sweep_fused(
                    seed, mh, packed_tables, num_sweeps=cfg.num_ls, block_chains=blk
                )
        elif cfg.sweep_mode == "sequential":
            xt = mcpg_init_values(mh)
            xt = degree_ordered_sweep(k_ls, xt, data, num_sweeps=cfg.num_ls)
            ls_bits = xt[:, :num_nodes] > 0.5
        else:
            xs_f = colored_sweep(
                k_ls,
                mh.astype(jnp.float32),
                env.cg.adj.astype(jnp.float32),
                env.cg.deg_w,
                data.color_masks,
                num_sweeps=cfg.num_ls,
            )
            ls_bits = xs_f > 0.5
        cuts = env.obj(ls_bits)
        return mh, ls_bits, cuts

    def reduce_step(ls_bits, cuts, best_xs, best_vs):
        """Best-of-repeats per chain + per-chain elitist + worst<-best."""
        chain_xs, chain_vs = pick_xs_by_vs(ls_bits, cuts, R)  # [C, N], [C]
        best_xs, best_vs = update_xs_by_vs(best_xs, best_vs, chain_xs, chain_vs)
        top = jnp.argmax(best_vs)
        worst = jnp.argmin(best_vs)
        best_xs = best_xs.at[worst].set(best_xs[top])
        best_vs = best_vs.at[worst].set(best_vs[top])
        # chains restart from their per-chain best-of-repeats
        restart = jnp.tile(chain_xs, (R, 1))
        return best_xs, best_vs, restart

    def loss_fn(params, mh_samples, value):
        probs = policy.apply(params)
        logp = bernoulli_logp(probs, mh_samples)
        return jnp.mean(logp * value)

    def update_step(params, opt_state, mh_samples, cuts):
        # value = expected-cut energy advantage: E = total_w - 2*cut, centered.
        energy = env.cg.total_w - 2.0 * cuts
        value = energy - jnp.mean(energy)

        def body(carry, _):
            params, opt_state = carry
            grads = jax.grad(loss_fn)(params, mh_samples, value)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), None

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), None, length=cfg.sample_epoch_num
        )
        return params, opt_state

    return policy, optimizer, sample_step, reduce_step, update_step


class MCPGLoopState(NamedTuple):
    """Full resumable state for the TrainLoop-driven MCPG run."""

    params: dict
    opt_state: optax.OptState
    key: jax.Array
    best_xs: jax.Array
    best_vs: jax.Array
    start_bits: jax.Array
    round_idx: jax.Array  # int32 scalar


def solve_maxcut_mcpg_runner(
    graph: Graph,
    cfg: MCPGConfig = MCPGConfig(),
    run_dir: str = "runs/mcpg",
    total_rounds: Optional[int] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    log_every: int = 1,
):
    """MCPG through the unified runtime (`train/runner.py:TrainLoop`):
    checkpoint/resume (full state incl. PRNG key + incumbent archive),
    metrics.jsonl stream, and the graceful-stop sentinel are live — the
    ElegantRL-runtime capabilities (`elegantrl/train/run.py:130`,
    `AgentBase.py:280-299`) on the flagship solver.

    The reference's per-epoch policy reset (`MCPG.py:366-367`) is folded
    into the jitted step as a masked reset on `round_idx % rounds_per_epoch
    == 0` (BernoulliPolicy init is zeros, Adam state starts at zeros, so the
    reset is a tree of zeros — jit-friendly). Returns (best_x, best_v,
    final_state).
    """
    from rlsolver_tpu.train.runner import LoopConfig, TrainLoop

    env = MaxcutEnv(graph, packed_sweep=cfg.sweep_mode == "packed")
    data = SweepData.build(graph)
    C, R = cfg.total_mcmc_num, cfg.repeat_times
    policy, optimizer, sample_step, reduce_step, update_step = _build_steps(
        env, data, cfg
    )
    rounds_per_epoch = max(1, cfg.reset_epoch_num // cfg.sample_epoch_num)
    if total_rounds is None:
        total_rounds = cfg.max_epoch_num * rounds_per_epoch

    def step_fn(state: MCPGLoopState):
        do_reset = (state.round_idx % rounds_per_epoch) == 0
        zeros = jax.tree.map(jnp.zeros_like, (state.params, state.opt_state))
        params, opt_state = jax.tree.map(
            lambda z, v: jnp.where(do_reset, z, v),
            zeros,
            (state.params, state.opt_state),
        )
        key, k_s = jax.random.split(state.key)
        probs = policy.apply(params)
        mh, ls_bits, cuts = sample_step(k_s, probs, state.start_bits)
        best_xs, best_vs, start_bits = reduce_step(
            ls_bits, cuts, state.best_xs, state.best_vs
        )
        params, opt_state = update_step(params, opt_state, mh, cuts)
        metrics = {
            "best_cut": jnp.max(best_vs),
            "mean_cut": jnp.mean(cuts),
        }
        return (
            MCPGLoopState(
                params, opt_state, key, best_xs, best_vs, start_bits,
                state.round_idx + 1,
            ),
            metrics,
        )

    key = jax.random.PRNGKey(cfg.seed)
    key, k_init, k_ws, k_p = jax.random.split(key, 4)
    xs = env.random_xs(k_init, C)
    vs = env.obj(xs)
    for _ in range(cfg.warmup_ls_rounds):
        key, k = jax.random.split(key)
        xs, vs = jax.jit(env.local_search)(k, xs, vs)
    params = policy.init(k_p)
    state = MCPGLoopState(
        params=params,
        opt_state=optimizer.init(params),
        key=key,
        best_xs=xs,
        best_vs=vs,
        start_bits=jnp.tile(xs, (R, 1)),
        round_idx=jnp.int32(0),
    )
    loop = TrainLoop(
        LoopConfig(
            run_dir=run_dir,
            total_steps=total_rounds,
            log_every=log_every,
            checkpoint_every=checkpoint_every,
            resume=resume,
            samples_per_step=R * C,
        ),
        step_fn,
    )
    state = loop.run(state)
    top = int(jnp.argmax(state.best_vs))
    return (
        np.asarray(state.best_xs[top]),
        float(state.best_vs[top]),
        state,
    )


def solve_maxcut_mcpg(
    graph: Graph,
    cfg: MCPGConfig = MCPGConfig(),
    instance_file: Optional[str] = None,
    save_dir: Optional[str] = None,
    verbose: bool = False,
    time_budget: Optional[float] = None,
):
    """Returns (best_x np.bool_[n], best_v float, evaluator).

    `time_budget` (seconds, wall clock from after warm start) stops the
    epoch loop early — the reference's benchmark protocol runs methods under
    a fixed time limit (`README.md:335`)."""
    # packed sweep_mode also accelerates the warm-start local search
    env = MaxcutEnv(graph, packed_sweep=cfg.sweep_mode == "packed")
    data = SweepData.build(graph)
    C, R = cfg.total_mcmc_num, cfg.repeat_times
    policy, optimizer, sample_step, reduce_step, update_step = _build_steps(env, data, cfg)

    key = jax.random.PRNGKey(cfg.seed)
    key, k_init, k_ws = jax.random.split(key, 3)

    # Warm start: parallel local search on C chains (MCPG.py:342-348).
    xs = env.random_xs(k_init, C)
    vs = env.obj(xs)
    for _ in range(cfg.warmup_ls_rounds):
        key, k = jax.random.split(key)
        xs, vs = jax.jit(env.local_search)(k, xs, vs)
    best_xs, best_vs = xs, vs

    params = policy.init(k_ws)
    opt_state = optimizer.init(params)

    sample_j = jax.jit(sample_step)
    reduce_j = jax.jit(reduce_step)
    update_j = jax.jit(update_step)
    apply_j = jax.jit(policy.apply)

    evaluator = Evaluator(
        save_dir, graph.num_nodes, np.asarray(best_xs[0]), float(best_vs[0]), True
    )
    start = time.time()
    start_bits = jnp.tile(best_xs, (R, 1))
    rounds_per_epoch = max(1, cfg.reset_epoch_num // cfg.sample_epoch_num)
    sps_log = []
    for epoch in range(cfg.max_epoch_num):
        # per-epoch policy reset, as in the reference loop (MCPG.py:366-367)
        key, k_reset = jax.random.split(key)
        params = policy.init(k_reset)
        opt_state = optimizer.init(params)
        for j in range(rounds_per_epoch):
            key, k_s = jax.random.split(key)
            probs = apply_j(params)
            t0 = time.time()
            mh, ls_bits, cuts = sample_j(k_s, probs, start_bits)
            best_xs, best_vs, start_bits = reduce_j(ls_bits, cuts, best_xs, best_vs)
            best_vs.block_until_ready()
            sps_log.append((R * C) / (time.time() - t0))
            params, opt_state = update_j(params, opt_state, mh, cuts)
            evaluator.record(epoch * rounds_per_epoch + j + 1, np.asarray(best_vs), np.asarray(best_xs))
            if verbose and j % 8 == 0:
                print(evaluator.log_line(j, f"samples/s {sps_log[-1]:.0f}"))
            if time_budget is not None and time.time() - start > time_budget:
                break
        if time_budget is not None and time.time() - start > time_budget:
            break
    evaluator.save()

    if instance_file is not None:
        write_graph_result(
            evaluator.best_v,
            time.time() - start,
            graph.num_nodes,
            "mcpg",
            evaluator.best_x.astype(int),
            instance_file,
            info={"samples_per_second": float(np.mean(sps_log[1:]) if len(sps_log) > 1 else 0)},
        )
    return evaluator.best_x, evaluator.best_v, evaluator
