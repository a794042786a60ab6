"""Learn-to-branch: B&B for binary ILPs + strong-branching imitation.

Reference counterpart: `rlsolver/methods_RLOR/RL_branching/` — the 5-step
SCIP pipeline (`README.md:1-20`): 01 generate MILP instances (set cover,
combinatorial auctions, facility location, independent set), 02/03 solve
with a strong-branching oracle and collect imitation samples over branching
features (`extract.py`), 04 train an IL policy (`04_train_il.py`) or RL
policy, 05 evaluate by solving metrics.

SCIP is not available here, so the pipeline is self-contained: a best-bound
branch-and-bound over scipy-linprog relaxations plays the solver, strong
branching plays the oracle, and a flax MLP scores candidate variables from
Khalil-style features. Evaluation compares B&B node counts across policies
(strong / learned / most-fractional / pseudo-random) — the reference's
metric, minus the SCIP dependency.
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import Callable, List, NamedTuple, Optional, Tuple

import numpy as np
from scipy.optimize import linprog

import jax
import jax.numpy as jnp


# ------------------------------------------------------------- instances
@dataclasses.dataclass(frozen=True)
class BinaryILP:
    """max c.x  s.t.  A x <= b,  x in {0,1}^n."""

    c: np.ndarray  # [n]
    a: np.ndarray  # [m, n]
    b: np.ndarray  # [m]
    name: str = ""

    @property
    def num_vars(self) -> int:
        return int(self.c.shape[0])


def generate_set_cover(
    n_items: int = 20, n_sets: int = 12, seed: int = 0, density: float = 0.5
) -> BinaryILP:
    """Min-cost set cover as max(-cost) (`01_generate_instances` capability).

    Near-unicost costs + dense membership give fractional LP roots (the
    regime where branching decisions actually matter)."""
    rng = np.random.RandomState(seed)
    membership = rng.rand(n_items, n_sets) < density
    for i in range(n_items):  # every item coverable
        if not membership[i].any():
            membership[i, rng.randint(n_sets)] = True
    cost = np.ones(n_sets) + rng.uniform(0, 0.05, n_sets)
    # cover: sum_j m_ij x_j >= 1  ->  -m x <= -1
    return BinaryILP(-cost, -membership.astype(np.float64), -np.ones(n_items), "setcover")


def generate_indset(graph, seed: int = 0) -> BinaryILP:
    """Max independent set: x_i + x_j <= 1 per edge."""
    n = graph.num_nodes
    m = graph.num_edges
    a = np.zeros((m, n))
    for e, (i, j) in enumerate(graph.edges):
        a[e, i] = 1.0
        a[e, j] = 1.0
    return BinaryILP(np.ones(n), a, np.ones(m), "indset")


def generate_cauctions(n_items: int = 15, n_bids: int = 20, seed: int = 0) -> BinaryILP:
    """Combinatorial auctions: bids over item bundles, items sold once."""
    rng = np.random.RandomState(seed)
    bundles = rng.rand(n_items, n_bids) < 0.25
    for j in range(n_bids):
        if not bundles[:, j].any():
            bundles[rng.randint(n_items), j] = True
    value = bundles.sum(axis=0) * rng.uniform(0.8, 1.2, n_bids)
    return BinaryILP(value, bundles.astype(np.float64), np.ones(n_items), "cauctions")


def generate_facility(n_customers: int = 8, n_facilities: int = 5, seed: int = 0) -> BinaryILP:
    """Uncapacitated facility location (binarized assignment form)."""
    rng = np.random.RandomState(seed)
    open_cost = rng.uniform(5, 15, n_facilities)
    serve_cost = rng.uniform(1, 8, (n_customers, n_facilities))
    n = n_facilities + n_customers * n_facilities  # y_f, x_cf
    c = np.concatenate([-open_cost, -serve_cost.reshape(-1)])
    rows, rhs = [], []
    # each customer served exactly once (as two inequalities)
    for cu in range(n_customers):
        row = np.zeros(n)
        row[n_facilities + cu * n_facilities : n_facilities + (cu + 1) * n_facilities] = 1.0
        rows.append(row)
        rhs.append(1.0)
        rows.append(-row)
        rhs.append(-1.0)
        # x_cf <= y_f
        for f in range(n_facilities):
            row = np.zeros(n)
            row[n_facilities + cu * n_facilities + f] = 1.0
            row[f] = -1.0
            rows.append(row)
            rhs.append(0.0)
    return BinaryILP(c, np.stack(rows), np.asarray(rhs), "facility")


# --------------------------------------------------------------- features
NUM_FEATURES = 6


def branching_features(
    c: np.ndarray, a: np.ndarray, x_lp: np.ndarray, cand: np.ndarray
) -> np.ndarray:
    """Khalil-style static+dynamic per-candidate features (`extract.py`
    capability): [frac distance, obj coef (normed), column density,
    column norm, up-frac, down-frac]. Shape [len(cand), 6]."""
    cn = np.abs(c).max() + 1e-9
    frac = x_lp[cand]
    density = (a[:, cand] != 0).mean(axis=0)
    colnorm = np.abs(a[:, cand]).sum(axis=0) / (np.abs(a).sum() + 1e-9)
    return np.stack(
        [
            0.5 - np.abs(frac - 0.5),
            c[cand] / cn,
            density,
            colnorm,
            1.0 - frac,
            frac,
        ],
        axis=1,
    ).astype(np.float32)


# ----------------------------------------------------------------- solver
class _Node(NamedTuple):
    neg_bound: float
    tie: int
    fixed0: frozenset
    fixed1: frozenset


def _solve_lp(ilp: BinaryILP, fixed0, fixed1):
    bounds = []
    for i in range(ilp.num_vars):
        if i in fixed0:
            bounds.append((0, 0))
        elif i in fixed1:
            bounds.append((1, 1))
        else:
            bounds.append((0, 1))
    res = linprog(
        c=-ilp.c, A_ub=ilp.a, b_ub=ilp.b, bounds=bounds, method="highs"
    )
    if not res.success:
        return None, -np.inf
    return np.asarray(res.x), -float(res.fun)


BranchPolicy = Callable[[np.ndarray, np.ndarray], int]
# (features [k, F], candidate indices [k]) -> position in candidates


def most_fractional_policy(features: np.ndarray, cand: np.ndarray) -> int:
    return int(np.argmax(features[:, 0]))


def strong_branching_score(ilp, fixed0, fixed1, bound, cand) -> np.ndarray:
    """Product-rule strong branching: score = dec_down * dec_up."""
    scores = np.zeros(len(cand))
    for k, i in enumerate(cand):
        _, up = _solve_lp(ilp, fixed0, fixed1 | {i})
        _, down = _solve_lp(ilp, fixed0 | {i}, fixed1)
        dec_up = max(1e-6, bound - up)
        dec_down = max(1e-6, bound - down)
        scores[k] = dec_up * dec_down
    return scores


@dataclasses.dataclass
class SolveStats:
    objective: float
    solution: np.ndarray
    num_nodes: int
    samples: List[Tuple[np.ndarray, int]]  # (features, chosen position)


def branch_and_bound(
    ilp: BinaryILP,
    policy: Optional[BranchPolicy] = None,
    use_strong: bool = False,
    collect_samples: bool = False,
    max_nodes: int = 2000,
    max_candidates: int = 8,
) -> SolveStats:
    """Best-bound B&B. `use_strong=True` branches by strong branching (the
    oracle, also the IL teacher when `collect_samples`); otherwise `policy`
    picks among the `max_candidates` most-fractional variables."""
    best_val = -np.inf
    best_x = np.zeros(ilp.num_vars)
    x0, bound0 = _solve_lp(ilp, frozenset(), frozenset())
    if x0 is None:
        return SolveStats(-np.inf, best_x, 0, [])
    heap = [_Node(-bound0, 0, frozenset(), frozenset())]
    tie = 1
    nodes = 0
    samples: List[Tuple[np.ndarray, int]] = []

    while heap and nodes < max_nodes:
        node = heapq.heappop(heap)
        if -node.neg_bound <= best_val + 1e-9:
            continue
        x, bound = _solve_lp(ilp, node.fixed0, node.fixed1)
        nodes += 1
        if x is None or bound <= best_val + 1e-9:
            continue
        frac_mask = (x > 1e-6) & (x < 1 - 1e-6)
        if not frac_mask.any():
            xi = np.rint(x)
            val = float(ilp.c @ xi)
            if (ilp.a @ xi <= ilp.b + 1e-6).all() and val > best_val:
                best_val, best_x = val, xi
            continue
        frac_idx = np.where(frac_mask)[0]
        order = np.argsort(-(0.5 - np.abs(x[frac_idx] - 0.5)))
        cand = frac_idx[order[:max_candidates]]
        feats = branching_features(ilp.c, ilp.a, x, cand)
        if use_strong:
            scores = strong_branching_score(ilp, node.fixed0, node.fixed1, bound, cand)
            pos = int(np.argmax(scores))
            if collect_samples:
                samples.append((feats, pos))
        elif policy is not None:
            pos = policy(feats, cand)
        else:
            pos = most_fractional_policy(feats, cand)
        i = int(cand[pos])
        for child_f0, child_f1 in (
            (node.fixed0 | {i}, node.fixed1),
            (node.fixed0, node.fixed1 | {i}),
        ):
            heapq.heappush(heap, _Node(-bound, tie, child_f0, child_f1))
            tie += 1
    return SolveStats(best_val, best_x, nodes, samples)


# --------------------------------------------------------------- IL policy
class BranchNet:
    """MLP scoring branching candidates (the IL policy, `model.py`)."""

    def __init__(self, hidden: int = 64, seed: int = 0, pad_candidates: int = 8):
        import flax.linen as nn

        class _Net(nn.Module):
            @nn.compact
            def __call__(self, feats):
                x = nn.relu(nn.Dense(hidden)(feats))
                x = nn.relu(nn.Dense(hidden)(x))
                return nn.Dense(1)(x)[..., 0]

        self.net = _Net()
        self.pad_candidates = pad_candidates
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, NUM_FEATURES))
        )
        # one compiled scorer at a fixed padded shape (eager per-node apply
        # would round-trip the accelerator per op)
        self._score = jax.jit(
            lambda p, f: self.net.apply(p, f)
        )

    def train_il(self, samples: List[Tuple[np.ndarray, int]], epochs: int = 200, lr: float = 1e-3):
        """Cross-entropy imitation of the strong-branching choice
        (`04_train_il.py` capability). Samples are padded to a fixed
        candidate count."""
        import optax

        k = max(s[0].shape[0] for s in samples)
        feats = np.zeros((len(samples), k, NUM_FEATURES), np.float32)
        mask = np.zeros((len(samples), k), bool)
        labels = np.zeros(len(samples), np.int32)
        for s, (f, pos) in enumerate(samples):
            feats[s, : f.shape[0]] = f
            mask[s, : f.shape[0]] = True
            labels[s] = pos
        feats_j, mask_j, labels_j = jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(labels)
        opt = optax.adam(lr)
        opt_state = opt.init(self.params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                logits = self.net.apply(p, feats_j)  # [S, K]
                logits = jnp.where(mask_j, logits, -1e9)
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

    def policy(self) -> BranchPolicy:
        pad = self.pad_candidates

        def choose(feats: np.ndarray, cand: np.ndarray) -> int:
            k = feats.shape[0]
            padded = np.zeros((pad, NUM_FEATURES), np.float32)
            padded[: min(k, pad)] = feats[:pad]
            scores = np.array(self._score(self.params, jnp.asarray(padded)))
            scores[k:] = -np.inf
            return int(np.argmax(scores))

        return choose
