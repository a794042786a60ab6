"""RL trainers for the three RL+OR pipelines (the "RL" half).

Reference counterparts:
  * learn-to-cut PPO/policy-gradient — `rlsolver/methods_RLOR/RL_cutting/
    run_PPO.py`, `run_policy_grad.py` (REINFORCE over which cut to add);
  * RL branching — `rlsolver/methods_RLOR/RL_branching/04_train_rl.py`
    (policy-gradient node-selector, vs the IL net of `04_train_il.py`);
  * RL pricing for column generation — `rlsolver/methods_RLOR/
    RL_column_generation/model.py:1-495`, `training.py` (learned scorer over
    candidate columns).

All three share one scaffold: a tiny MLP scores a variable-length candidate
list (cuts / branching variables / pricing columns), actions are sampled
from the masked softmax, and REINFORCE with a moving baseline pushes the
scorer toward decisions that tighten bounds faster / shrink trees / cut
pricing iterations. Training is host-driven (the envs are LP-solver-bound,
exactly as in the reference) with one fixed-shape jitted update step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlsolver_tpu.solvers.branching import (
    BinaryILP,
    SolveStats,
    branch_and_bound,
    generate_set_cover,
)
from rlsolver_tpu.solvers.column_generation import (
    CuttingStockInstance,
    best_reduced_cost,
    solve_cutting_stock,
)
from rlsolver_tpu.solvers.cutting import CuttingPlaneEnv, max_violation_policy


# ------------------------------------------------------------ shared scaffold
class ScorePolicy:
    """MLP scorer over candidate feature rows with masked-softmax sampling."""

    def __init__(self, num_features: int, hidden: int = 32, seed: int = 0,
                 max_candidates: int = 24, lr: float = 3e-3):
        import flax.linen as nn

        class _Net(nn.Module):
            @nn.compact
            def __call__(self, feats):
                x = nn.tanh(nn.Dense(hidden)(feats))
                x = nn.tanh(nn.Dense(hidden)(x))
                return nn.Dense(1)(x)[..., 0]

        self.net = _Net()
        self.num_features = num_features
        self.max_candidates = max_candidates
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, num_features))
        )
        self.opt = optax.adam(lr)
        self.opt_state = self.opt.init(self.params)
        self._score = jax.jit(lambda p, f: self.net.apply(p, f))

        def update(params, opt_state, feats, mask, actions, adv):
            def loss_fn(p):
                logits = self.net.apply(p, feats)  # [S, K]
                logits = jnp.where(mask, logits, -1e9)
                logp = jax.nn.log_softmax(logits, axis=1)
                chosen = logp[jnp.arange(actions.shape[0]), actions]
                return -jnp.mean(chosen * adv)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        self._update = jax.jit(update)

    def _pad(self, feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        k = min(feats.shape[0], self.max_candidates)
        out = np.zeros((self.max_candidates, self.num_features), np.float32)
        mask = np.zeros(self.max_candidates, bool)
        out[:k], mask[:k] = feats[:k], True
        return out, mask

    def scores(self, feats: np.ndarray) -> np.ndarray:
        padded, mask = self._pad(feats)
        s = np.array(self._score(self.params, jnp.asarray(padded)))
        s[~mask] = -np.inf
        return s[: feats.shape[0]]

    def sample(self, feats: np.ndarray, rng: np.random.Generator,
               temperature: float = 1.0) -> int:
        s = self.scores(feats) / temperature
        s = s - s.max()
        p = np.exp(s)
        p /= p.sum()
        return int(rng.choice(len(p), p=p))

    def greedy(self, feats: np.ndarray) -> int:
        return int(np.argmax(self.scores(feats)))

    def imitate(self, samples: Sequence[Tuple[np.ndarray, int]],
                epochs: int = 150):
        """Cross-entropy pretraining on (features, expert action) pairs —
        the IL stage (`04_train_il.py`) in the shared-scaffold net, so RL
        fine-tuning (`04_train_rl.py`) starts from the imitation solution."""
        feats = np.zeros((len(samples), self.max_candidates, self.num_features),
                         np.float32)
        mask = np.zeros((len(samples), self.max_candidates), bool)
        labels = np.zeros(len(samples), np.int32)
        for s, (f, pos) in enumerate(samples):
            feats[s], mask[s] = self._pad(f)
            labels[s] = min(pos, self.max_candidates - 1)
        feats_j, mask_j = jnp.asarray(feats), jnp.asarray(mask)
        labels_j = jnp.asarray(labels)
        opt = optax.adam(1e-3)
        opt_state = opt.init(self.params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                logits = jnp.where(mask_j, self.net.apply(p, feats_j), -1e9)
                logp = jax.nn.log_softmax(logits, axis=1)
                return -jnp.mean(logp[jnp.arange(labels_j.shape[0]), labels_j])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        history = []
        for _ in range(epochs):
            self.params, opt_state, loss = step(self.params, opt_state)
            history.append(float(loss))
        return history

    def reinforce(self, steps: Sequence[Tuple[np.ndarray, int, float]]):
        """steps: (features [K, F], action, advantage). One SGD step."""
        if not steps:
            return 0.0
        feats = np.zeros((len(steps), self.max_candidates, self.num_features),
                         np.float32)
        mask = np.zeros((len(steps), self.max_candidates), bool)
        actions = np.zeros(len(steps), np.int32)
        adv = np.zeros(len(steps), np.float32)
        for s, (f, a, g) in enumerate(steps):
            feats[s], mask[s] = self._pad(f)
            actions[s] = min(a, self.max_candidates - 1)
            adv[s] = g
        self.params, self.opt_state, loss = self._update(
            self.params, self.opt_state, jnp.asarray(feats), jnp.asarray(mask),
            jnp.asarray(actions), jnp.asarray(adv)
        )
        return float(loss)


# --------------------------------------------------------------- learn-to-cut
def multi_knapsack_ilp(seed: int, n: int = 14, m: int = 3) -> BinaryILP:
    """Seeded multi-row knapsack family (fractional LP roots, many covers)."""
    rng = np.random.RandomState(seed)
    w = rng.uniform(1, 10, (m, n))
    p = w.mean(axis=0) + rng.uniform(0, 2, n)
    cap = 0.5 * w.sum(axis=1)
    return BinaryILP(p, w, cap, f"mknap_{seed}")


def deceptive_knapsack_ilp(seed: int, n_a: int = 8, n_b: int = 8) -> BinaryILP:
    """Two-block family where max-violation is provably suboptimal: block A
    (low profit, tight capacity) yields the highest-violation covers but
    cutting it barely moves the LP bound; block B (high profit) yields
    lower-violation covers with real bound impact. A 1-step-lookahead oracle
    strictly beats max-violation on ~20% of seeds and never loses by more
    than noise — the learnable margin for the RL cut-selector."""
    rng = np.random.RandomState(seed)
    wa = rng.uniform(1, 3, n_a)
    pa = rng.uniform(0.05, 0.15, n_a)
    wb = rng.uniform(4, 10, n_b)
    pb = wb * rng.uniform(0.9, 1.1, n_b)
    a = np.stack([
        np.concatenate([wa, np.zeros(n_b)]),
        np.concatenate([np.zeros(n_a), wb]),
    ])
    b = np.asarray([0.55 * wa.sum(), 0.5 * wb.sum()])
    return BinaryILP(np.concatenate([pa, pb]), a, b, f"dec_{seed}")


def eval_cut_policy(policy: Callable, seeds: Sequence[int], rounds: int = 8,
                    instance_fn: Callable[[int], BinaryILP] = multi_knapsack_ilp,
                    **ilp_kw) -> float:
    """Mean LP bound after `rounds` cuts (lower = tighter = better)."""
    total = 0.0
    for s in seeds:
        env = CuttingPlaneEnv(instance_fn(s, **ilp_kw))
        feats, cuts = env.reset()
        for _ in range(rounds):
            if not cuts:
                break
            feats, cuts, _, done = env.step(cuts, policy(feats, cuts))
            if done:
                break
        total += env.bound
    return total / len(seeds)


def train_cut_policy(
    num_updates: int = 40,
    episodes_per_update: int = 8,
    rounds: int = 8,
    seed: int = 0,
    train_seeds: Sequence[int] = tuple(range(100, 140)),
    instance_fn: Callable[[int], BinaryILP] = multi_knapsack_ilp,
    verbose: bool = False,
) -> ScorePolicy:
    """REINFORCE cut-selector (ref `RL_cutting/run_policy_grad.py` /
    `run_PPO.py`): reward = per-step dual-bound tightening, reward-to-go
    credit, moving-average baseline."""
    net = ScorePolicy(num_features=4, seed=seed)
    rng = np.random.default_rng(seed)
    baseline = 0.0
    for u in range(num_updates):
        steps: List[Tuple[np.ndarray, int, float]] = []
        returns = []
        for _ in range(episodes_per_update):
            env = CuttingPlaneEnv(instance_fn(int(rng.choice(train_seeds))))
            feats, cuts = env.reset()
            traj: List[Tuple[np.ndarray, int]] = []
            rewards: List[float] = []
            for _ in range(rounds):
                if not cuts:
                    break
                a = net.sample(feats, rng)
                traj.append((feats, a))
                feats, cuts, r, done = env.step(cuts, a)
                rewards.append(r)
                if done:
                    break
            togo = np.cumsum(rewards[::-1])[::-1]
            returns.append(float(togo[0]) if len(togo) else 0.0)
            for (f, a), g in zip(traj, togo):
                steps.append((f, a, float(g)))
        mean_ret = float(np.mean(returns))
        baseline = mean_ret if u == 0 else 0.9 * baseline + 0.1 * mean_ret
        loss = net.reinforce([(f, a, g - baseline) for f, a, g in steps])
        if verbose and u % 10 == 0:
            print(f"cut update {u}: return {mean_ret:.3f} loss {loss:.4f}")
    return net


# --------------------------------------------------------------- RL branching
def train_branch_policy_rl(
    instances: Optional[Sequence[BinaryILP]] = None,
    num_updates: int = 30,
    episodes_per_update: int = 4,
    seed: int = 0,
    max_nodes: int = 400,
    temperature: float = 0.7,
    init_from: Optional[ScorePolicy] = None,
    lr: float = 3e-3,
    hidden: int = 64,
    validation: Optional[Sequence[BinaryILP]] = None,
    verbose: bool = False,
) -> ScorePolicy:
    """Policy-gradient branching-variable selector (ref `04_train_rl.py`):
    an episode is a full B&B run; reward = -(nodes expanded); per-instance
    running baselines remove instance-difficulty variance. Pass an
    IL-pretrained `init_from` net to fine-tune (the reference pipeline runs
    `04_train_il.py` then optionally `04_train_rl.py`)."""
    if instances is None:
        instances = [generate_set_cover(12, 20, seed=s) for s in range(6)]
    net = ScorePolicy(num_features=6, seed=seed, max_candidates=8, lr=lr,
                      hidden=hidden)
    if init_from is not None:
        net.params = init_from.params
        net.opt_state = net.opt.init(net.params)
    best_params, best_nodes = net.params, None
    val_set = validation if validation is not None else instances

    def greedy_nodes():
        total = 0.0
        for ilp in val_set:
            total += np.log(max(1, branch_and_bound(
                ilp, policy=lambda f, c: net.greedy(f), max_nodes=max_nodes
            ).num_nodes))
        return float(np.exp(total / len(val_set)))
    rng = np.random.default_rng(seed)
    baselines = {}
    for u in range(num_updates):
        steps: List[Tuple[np.ndarray, int, float]] = []
        node_counts = []
        for _ in range(episodes_per_update):
            idx = int(rng.integers(len(instances)))
            ilp = instances[idx]
            traj: List[Tuple[np.ndarray, int]] = []

            def stochastic_policy(feats, cand):
                a = net.sample(feats, rng, temperature)
                traj.append((feats, a))
                return a

            stats = branch_and_bound(ilp, policy=stochastic_policy,
                                     max_nodes=max_nodes)
            node_counts.append(stats.num_nodes)
            b = baselines.get(idx, float(stats.num_nodes))
            baselines[idx] = 0.8 * b + 0.2 * stats.num_nodes
            adv = (b - stats.num_nodes) / max(1.0, b)  # fewer nodes -> positive
            for f, a in traj:
                steps.append((f, a, adv))
        loss = net.reinforce(steps)
        if u % 5 == 0 or u == num_updates - 1:
            # validation-based checkpoint selection (the reference's
            # `select_best_neural_network.py:31` discipline)
            g = greedy_nodes()
            if best_nodes is None or g < best_nodes:
                best_nodes, best_params = g, net.params
            if verbose:
                print(f"branch update {u}: nodes {np.mean(node_counts):.1f} "
                      f"greedy geomean {g:.2f} loss {loss:.4f}")
    net.params = best_params
    return net


def eval_branch_policy(policy, instances: Sequence[BinaryILP],
                       max_nodes: int = 2000) -> Tuple[float, float]:
    """(geometric-mean nodes, mean objective) over instances
    (ref `05_evaluate.py` geometric-mean protocol)."""
    nodes, objs = [], []
    for ilp in instances:
        stats = branch_and_bound(ilp, policy=policy, max_nodes=max_nodes)
        nodes.append(max(1, stats.num_nodes))
        objs.append(stats.objective)
    return float(np.exp(np.mean(np.log(nodes)))), float(np.mean(objs))


# ------------------------------------------------------------ RL pricing (CG)
def _pricing_features(inst: CuttingStockInstance, duals: np.ndarray,
                      candidates: List[np.ndarray]) -> np.ndarray:
    """[reduced cost, fill ratio, distinct items, dual mass] per candidate."""
    out = []
    dsum = duals.sum() + 1e-9
    for a in candidates:
        fill = float(a @ inst.sizes) / inst.roll_width
        out.append([
            1.0 - float(duals @ a),
            fill,
            float((a > 0).sum()) / inst.num_items,
            float(duals @ (a > 0)) / dsum,
        ])
    return np.asarray(out, np.float32)


def train_pricing_policy(
    num_updates: int = 30,
    episodes_per_update: int = 6,
    seed: int = 0,
    num_candidates: int = 4,
    train_sizes: Sequence[int] = (8, 10, 12),
    validation: Optional[Sequence[CuttingStockInstance]] = None,
    lr: float = 1e-3,
    verbose: bool = False,
) -> ScorePolicy:
    """Learned pricing scorer for cutting-stock CG (ref
    `RL_column_generation/model.py`, `training.py`): an episode is a full CG
    solve; reward = -(pricing iterations). The net is warm-started to
    imitate exact pricing (choose the most negative reduced cost), then
    REINFORCE explores the candidate pool; checkpoints are selected by
    greedy validation iterations (never worse than the imitation start)."""
    net = ScorePolicy(num_features=4, seed=seed, max_candidates=num_candidates,
                      lr=lr)
    rng = np.random.default_rng(seed)
    baselines = {}

    # imitation warm start: label = candidate 0 (the exact pricing column)
    warm = []
    for s in range(8):
        inst = CuttingStockInstance.random(int(rng.choice(train_sizes)), seed=1000 + s)

        def record(duals, candidates, _inst=inst):
            warm.append((_pricing_features(_inst, duals, candidates), 0))
            return 0

        solve_cutting_stock(inst, policy=record, num_candidates=num_candidates)
    net.imitate(warm, epochs=200)

    if validation is None:
        validation = [CuttingStockInstance.random(10, seed=900 + v) for v in range(6)]

    def greedy_iters():
        total = 0
        for inst in validation:
            def p(duals, candidates, _inst=inst):
                return net.greedy(_pricing_features(_inst, duals, candidates))

            total += solve_cutting_stock(
                inst, policy=p, num_candidates=num_candidates
            ).num_iterations
        return total / len(validation)

    best_params, best_iters = net.params, greedy_iters()
    for u in range(num_updates):
        steps: List[Tuple[np.ndarray, int, float]] = []
        iters = []
        for _ in range(episodes_per_update):
            n = int(rng.choice(train_sizes))
            s = int(rng.integers(50))
            inst = CuttingStockInstance.random(n, seed=s)
            traj: List[Tuple[np.ndarray, int]] = []

            def rl_policy(duals, candidates):
                feats = _pricing_features(inst, duals, candidates)
                a = net.sample(feats, rng)
                traj.append((feats, a))
                return a

            res = solve_cutting_stock(inst, policy=rl_policy,
                                      num_candidates=num_candidates)
            iters.append(res.num_iterations)
            key = (n, s)
            b = baselines.get(key, float(res.num_iterations))
            baselines[key] = 0.8 * b + 0.2 * res.num_iterations
            adv = (b - res.num_iterations) / max(1.0, b)
            for f, a in traj:
                steps.append((f, a, adv))
        loss = net.reinforce(steps)
        if u % 5 == 0 or u == num_updates - 1:
            g = greedy_iters()
            if g < best_iters:
                best_iters, best_params = g, net.params
            if verbose:
                print(f"pricing update {u}: iters {np.mean(iters):.1f} "
                      f"greedy-val {g:.2f} loss {loss:.4f}")
    net.params = best_params
    return net


def eval_pricing_policy(policy, instances: Sequence[CuttingStockInstance],
                        num_candidates: int = 4) -> Tuple[float, float]:
    """(mean pricing iterations, mean integer value) over instances."""
    iters, vals = [], []
    for inst in instances:
        res = solve_cutting_stock(inst, policy=policy,
                                  num_candidates=num_candidates)
        iters.append(res.num_iterations)
        vals.append(res.int_value)
    return float(np.mean(iters)), float(np.mean(vals))
