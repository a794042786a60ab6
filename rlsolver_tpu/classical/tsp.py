"""Classical TSP zoo: construction heuristics + batched local search.

Reference counterpart: `rlsolver/methods_problem_specific/TSP/` — vendored
single-threaded "lesson" implementations of christofides, nearest neighbor
(`nn.py`), cheapest/farthest/nearest insertion (`ins_c.py`, `ins_f.py`,
`ins_n.py`), 2-opt (`opt_2.py`), 3-opt (`opt_3.py`), tabu search
(`s_tabu.py`), GA (`ga.py`), SA (`sa.py`), and greedy Karp-Steele patching
(`gksp.py`).

TPU-first redesign: tour-improvement (2-opt) is a batched best-improvement
sweep — the full [N, N] move-delta matrix is computed as dense array ops and
vmapped over sims, instead of the reference's nested python loops. The
construction heuristics and matching-based methods (christofides, GKSP) are
host-side numpy/scipy by nature (sequential, tiny) and feed their tours into
the batched device improvers. MCMC-style improvement (sampled 2-opt with
annealing) lives in `rlsolver_tpu.envs.tsp.TSPEnv.anneal`.

Tours are 0-indexed permutations of length N (closing edge implied).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.problems.objectives import obj_tsp


# -------------------------------------------------------- host constructions
def nearest_neighbor_tour(dist: np.ndarray, start: int = 0) -> np.ndarray:
    """Greedy nearest-neighbor construction (`TSP/nn.py`)."""
    n = dist.shape[0]
    visited = np.zeros(n, bool)
    tour = np.empty(n, np.int32)
    tour[0] = start
    visited[start] = True
    for i in range(1, n):
        d = dist[tour[i - 1]].copy()
        d[visited] = np.inf
        tour[i] = int(d.argmin())
        visited[tour[i]] = True
    return tour


def _insertion_tour(dist: np.ndarray, mode: str, start: int = 0) -> np.ndarray:
    """Shared insertion skeleton: grow a subtour by repeatedly choosing a
    city (by `mode`) and splicing it at the cheapest position.

    mode='nearest'  -> city closest to the subtour      (`TSP/ins_n.py`)
    mode='farthest' -> city farthest from the subtour   (`TSP/ins_f.py`)
    mode='cheapest' -> city with the cheapest insertion (`TSP/ins_c.py`)
    """
    n = dist.shape[0]
    in_tour = np.zeros(n, bool)
    first = int(np.argsort(dist[start] + np.where(np.arange(n) == start, np.inf, 0))[0])
    tour = [start, first]
    in_tour[start] = in_tour[first] = True
    while len(tour) < n:
        outside = np.where(~in_tour)[0]
        t = np.asarray(tour)
        nxt = np.roll(t, -1)
        # insertion cost of city c at each edge (a, b): d(a,c)+d(c,b)-d(a,b)
        inc = dist[t][:, outside] + dist[nxt][:, outside] - dist[t, nxt][:, None]
        if mode == "cheapest":
            flat = int(np.argmin(inc))
            pos, ci = np.unravel_index(flat, inc.shape)
        else:
            d_to_tour = dist[np.ix_(t, outside)].min(axis=0)
            ci = int(d_to_tour.argmin() if mode == "nearest" else d_to_tour.argmax())
            pos = int(np.argmin(inc[:, ci]))
        tour.insert(pos + 1, int(outside[ci]))
        in_tour[outside[ci]] = True
    return np.asarray(tour, np.int32)


def nearest_insertion_tour(dist: np.ndarray, start: int = 0) -> np.ndarray:
    return _insertion_tour(dist, "nearest", start)


def farthest_insertion_tour(dist: np.ndarray, start: int = 0) -> np.ndarray:
    return _insertion_tour(dist, "farthest", start)


def cheapest_insertion_tour(dist: np.ndarray, start: int = 0) -> np.ndarray:
    return _insertion_tour(dist, "cheapest", start)


def christofides_tour(dist: np.ndarray) -> np.ndarray:
    """Christofides 1.5-approximation (`TSP/christofides.py`): MST +
    min-weight perfect matching on odd-degree nodes + shortcut eulerian
    circuit. Uses networkx for the matching/euler plumbing."""
    import networkx as nx

    n = dist.shape[0]
    g = nx.Graph()
    for i in range(n):
        for j in range(i + 1, n):
            g.add_edge(i, j, weight=float(dist[i, j]))
    mst = nx.minimum_spanning_tree(g)
    odd = [v for v, d in mst.degree() if d % 2 == 1]
    matching = nx.algorithms.matching.min_weight_matching(g.subgraph(odd))
    multi = nx.MultiGraph(mst)
    multi.add_edges_from(matching)
    circuit = nx.eulerian_circuit(multi, source=0)
    seen = np.zeros(n, bool)
    tour = []
    for a, _ in circuit:
        if not seen[a]:
            tour.append(a)
            seen[a] = True
    return np.asarray(tour, np.int32)


def karp_steele_tour(dist: np.ndarray) -> np.ndarray:
    """Greedy Karp-Steele patching (`TSP/gksp.py`): solve the assignment
    relaxation (min-cost cycle cover), then repeatedly patch the two cycles
    whose merge is cheapest until one tour remains."""
    from scipy.optimize import linear_sum_assignment

    n = dist.shape[0]
    d = dist.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    _, succ = linear_sum_assignment(d)

    # extract cycles of the assignment permutation
    cycles = []
    seen = np.zeros(n, bool)
    for s in range(n):
        if seen[s]:
            continue
        cyc = []
        v = s
        while not seen[v]:
            seen[v] = True
            cyc.append(v)
            v = int(succ[v])
        cycles.append(cyc)

    # patch: merging cycle edges (a->sa) and (b->sb) into a->sb, b->sa
    while len(cycles) > 1:
        best = None
        for ia in range(len(cycles)):
            for ib in range(ia + 1, len(cycles)):
                ca, cb = cycles[ia], cycles[ib]
                a_arr = np.asarray(ca)
                b_arr = np.asarray(cb)
                sa = np.roll(a_arr, -1)
                sb = np.roll(b_arr, -1)
                # merge cost of redirecting a->sa, b->sb into a->sb, b->sa
                delta = (
                    dist[a_arr[:, None], sb[None, :]]
                    + dist[b_arr[None, :], sa[:, None]]
                    - dist[a_arr, sa][:, None]
                    - dist[b_arr, sb][None, :]
                )
                k = int(np.argmin(delta))
                i, j = np.unravel_index(k, delta.shape)
                cand = (float(delta[i, j]), ia, ib, int(i), int(j))
                if best is None or cand[0] < best[0]:
                    best = cand
        _, ia, ib, i, j = best
        ca, cb = cycles[ia], cycles[ib]
        # successor of ca[i] becomes cb[j+1...], then back to ca[i+1...]
        merged = ca[: i + 1] + cb[j + 1 :] + cb[: j + 1] + ca[i + 1 :]
        cycles = [c for k2, c in enumerate(cycles) if k2 not in (ia, ib)] + [merged]
    return np.asarray(cycles[0], np.int32)


# ------------------------------------------------------- batched local search
def _move_deltas(tour: jax.Array, dist: jax.Array) -> jax.Array:
    """2-opt delta matrix, f32 [N, N]: delta[i, j] (i < j) = change from
    reversing tour[i..j]. Dense array ops — the MXU-friendly formulation of
    the reference's double loop (`opt_2.py:25-47`)."""
    n = tour.shape[0]
    prev = jnp.roll(tour, 1)  # tour[i-1]
    nxt = jnp.roll(tour, -1)  # tour[j+1]
    d_pi_tj = dist[prev][:, tour]  # d(tour[i-1], tour[j])
    d_ti_nj = dist[tour][:, nxt]  # d(tour[i], tour[j+1])
    d_pi_ti = dist[prev, tour]  # d(tour[i-1], tour[i])
    d_tj_nj = dist[tour, nxt]  # d(tour[j], tour[j+1])
    delta = d_pi_tj + d_ti_nj - d_pi_ti[:, None] - d_tj_nj[None, :]
    ii = jnp.arange(n)
    valid = (ii[:, None] < ii[None, :]) & (ii[:, None] > 0) & (ii[None, :] < n - 1)
    return jnp.where(valid, delta, jnp.inf)


def _apply_reversal(tour: jax.Array, i: jax.Array, j: jax.Array) -> jax.Array:
    """Reverse tour[i..j] without dynamic slicing: position arithmetic."""
    n = tour.shape[0]
    pos = jnp.arange(n)
    inside = (pos >= i) & (pos <= j)
    src = jnp.where(inside, i + j - pos, pos)
    return tour[src]


def two_opt_best_improvement(
    tours: jax.Array, dist: jax.Array, max_iters: int = 200
) -> Tuple[jax.Array, jax.Array]:
    """Batched best-improvement 2-opt descent to a local optimum.

    tours: [B, N]. Each iteration applies the single best 2-opt move per
    tour (no-op once locally optimal). Returns (tours, lengths).
    """
    dist = jnp.asarray(dist, jnp.float32)

    def one(tour):
        def body(carry, _):
            t, done = carry
            delta = _move_deltas(t, dist)
            k = jnp.argmin(delta)
            i, j = k // t.shape[0], k % t.shape[0]
            improve = delta[i, j] < -1e-6
            t_new = jnp.where(improve & ~done, _apply_reversal(t, i, j), t)
            return (t_new, done | ~improve), None

        (t, _), _ = jax.lax.scan(body, (tour, jnp.bool_(False)), None, length=max_iters)
        return t

    tours = jax.vmap(one)(tours)
    nxt = jnp.roll(tours, -1, axis=1)
    lengths = jnp.sum(
        dist[tours.reshape(-1), nxt.reshape(-1)].reshape(tours.shape), axis=1
    )
    return tours, lengths


def three_opt_tour(
    dist: np.ndarray, tour: np.ndarray, max_rounds: int = 50
) -> Tuple[np.ndarray, float]:
    """True 3-opt best-improvement descent (reference `TSP/opt_3.py`
    semantics: every (i<j<k) segment triple, all 7 reconnections, repeat
    until no move improves).

    The reference enumerates triples in nested python loops with deepcopy
    tour rebuilds; here each outer index i evaluates its whole (j, k) plane
    as vectorized numpy delta arrays — only the 6 boundary cities matter
    per move, so no tour is materialized until the winning move is applied.
    Host-side by design (sequential accept dependency, tiny instances);
    the batched device path is `or_opt_moves`/`two_opt_best_improvement`.
    Returns (tour, length).
    """
    d = np.asarray(dist, np.float64)
    t = np.asarray(tour, np.int64).copy()
    n = len(t)
    if n < 6:
        return t, float(-obj_tsp(t, d))
    for _ in range(max_rounds):
        best_delta = -1e-9
        best_move = None
        for i in range(n - 2):
            a, b = t[i], t[i + 1]
            j = np.arange(i + 1, n - 1)
            k_hi = n if i > 0 else n - 1  # i==0, k==n-1 would re-split edge (f==a)
            k = np.arange(i + 2, k_hi)
            J, K = np.meshgrid(j, k, indexing="ij")
            valid = J < K
            c, dd = t[J], t[J + 1]
            e, f = t[K], t[(K + 1) % n]
            d0 = d[a, b] + d[c, dd] + d[e, f]
            deltas = np.stack(
                [
                    d[a, c] + d[b, dd] + d[e, f],  # rev X1
                    d[a, b] + d[c, e] + d[dd, f],  # rev X2
                    d[a, c] + d[b, e] + d[dd, f],  # rev both
                    d[a, dd] + d[e, b] + d[c, f],  # swap
                    d[a, e] + d[dd, b] + d[c, f],  # swap + rev X2
                    d[a, dd] + d[e, c] + d[b, f],  # swap + rev X1
                    d[a, e] + d[dd, c] + d[b, f],  # swap + rev both
                ]
            ) - d0
            deltas = np.where(valid[None], deltas, np.inf)
            m = np.argmin(deltas)
            case, jj, kk = np.unravel_index(m, deltas.shape)
            if deltas[case, jj, kk] < best_delta:
                best_delta = float(deltas[case, jj, kk])
                best_move = (int(case), i, int(J[jj, kk]), int(K[jj, kk]))
        if best_move is None:
            break
        case, i, j, k = best_move
        A, X1, X2, C = t[: i + 1], t[i + 1 : j + 1], t[j + 1 : k + 1], t[k + 1 :]
        r = lambda s: s[::-1]
        parts = [
            (r(X1), X2), (X1, r(X2)), (r(X1), r(X2)),
            (X2, X1), (r(X2), X1), (X2, r(X1)), (r(X2), r(X1)),
        ][case]
        t = np.concatenate([A, *parts, C])
    return t, float(-obj_tsp(t, d))


def or_opt_moves(
    key: jax.Array, tours: jax.Array, dist: jax.Array, num_iters: int = 200
) -> Tuple[jax.Array, jax.Array]:
    """Batched sampled 3-opt-style segment moves (`opt_3.py` capability):
    relocate a random segment of length 1-3 to a random position, accept if
    shorter. Sampled first-improvement — jit-friendly fixed trip count."""
    dist = jnp.asarray(dist, jnp.float32)
    b, n = tours.shape

    def length(ts):
        nxt = jnp.roll(ts, -1, axis=1)
        return jnp.sum(dist[ts.reshape(-1), nxt.reshape(-1)].reshape(ts.shape), axis=1)

    def body(carry, k):
        ts, ls = carry
        k1, k2, k3 = jax.random.split(k, 3)
        seg = jax.random.randint(k1, (b,), 1, 4)  # segment length 1..3
        i = jax.random.randint(k2, (b,), 1, n - 3)
        j = jax.random.randint(k3, (b,), 1, n - 3)

        def relocate(t, i, seg, j):
            pos = jnp.arange(n)
            # remove segment [i, i+seg), reinsert after position j (of the
            # compacted tour); all done via gather index arithmetic
            keep_idx = jnp.where(pos < i, pos, pos + seg)  # first n-seg slots
            kept = t[jnp.clip(keep_idx, 0, n - 1)]
            segment = t[jnp.clip(i + pos, 0, n - 1)]
            jj = jnp.minimum(j, n - seg - 1)
            out_pos = jnp.arange(n)
            before = out_pos <= jj
            in_seg = (out_pos > jj) & (out_pos <= jj + seg)
            new = jnp.where(
                before,
                kept[jnp.clip(out_pos, 0, n - 1)],
                jnp.where(
                    in_seg,
                    segment[jnp.clip(out_pos - jj - 1, 0, n - 1)],
                    kept[jnp.clip(out_pos - seg, 0, n - 1)],
                ),
            )
            return new

        cand = jax.vmap(relocate)(ts, i, seg, j)
        cl = length(cand)
        better = cl < ls - 1e-6
        ts = jnp.where(better[:, None], cand, ts)
        ls = jnp.where(better, cl, ls)
        return (ts, ls), None

    ls = length(tours)
    (tours, ls), _ = jax.lax.scan(body, (tours, ls), jax.random.split(key, num_iters))
    return tours, ls


def tabu_search(
    key: jax.Array,
    tours: jax.Array,
    dist: jax.Array,
    num_iters: int = 100,
    tenure: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Batched 2-opt tabu search (`s_tabu.py` capability): per iteration take
    the best non-tabu move (aspiration: tabu moves allowed if they beat the
    incumbent), mark the reversed pair tabu for `tenure` iterations."""
    dist = jnp.asarray(dist, jnp.float32)
    b, n = tours.shape

    def length(t):
        return jnp.sum(dist[t, jnp.roll(t, -1)])

    def one(key, tour):
        tabu = jnp.zeros((n, n), jnp.int32)
        best_t, best_l = tour, length(tour)

        def body(carry, it):
            t, l, tabu, best_t, best_l = carry
            delta = _move_deltas(t, dist)
            cand_l = l + delta
            is_tabu = tabu > it
            aspires = cand_l < best_l - 1e-6
            blocked = is_tabu & ~aspires
            masked = jnp.where(blocked, jnp.inf, delta)
            k = jnp.argmin(masked)
            i, j = k // n, k % n
            ok = jnp.isfinite(masked[i, j])
            t_new = jnp.where(ok, _apply_reversal(t, i, j), t)
            l_new = jnp.where(ok, l + delta[i, j], l)
            tabu = tabu.at[i, j].set(jnp.where(ok, it + tenure, tabu[i, j]))
            improve = l_new < best_l
            best_t = jnp.where(improve, t_new, best_t)
            best_l = jnp.where(improve, l_new, best_l)
            return (t_new, l_new, tabu, best_t, best_l), None

        (t, l, tabu, best_t, best_l), _ = jax.lax.scan(
            body,
            (tour, length(tour), tabu, best_t, best_l),
            jnp.arange(num_iters),
        )
        return best_t, best_l

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, tours)


def genetic_tsp(
    key: jax.Array,
    dist: np.ndarray,
    pop_size: int = 64,
    num_generations: int = 100,
    elite_frac: float = 0.25,
    mutation_rate: float = 0.3,
) -> Tuple[np.ndarray, float]:
    """Order-crossover GA with 2-opt polishing of the elite (`TSP/ga.py`).

    Host-side selection/crossover (data-dependent splicing) with batched
    device evaluation + 2-opt improvement of offspring each generation.
    """
    n = dist.shape[0]
    rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    pop = np.stack([rng.permutation(n) for _ in range(pop_size)]).astype(np.int32)
    n_elite = max(2, int(pop_size * elite_frac))

    def lengths(p):
        nxt = np.roll(p, -1, axis=1)
        return dist[p.reshape(-1), nxt.reshape(-1)].reshape(p.shape).sum(axis=1)

    def order_crossover(a, b):
        i, j = sorted(rng.choice(n, 2, replace=False))
        child = -np.ones(n, np.int32)
        child[i : j + 1] = a[i : j + 1]
        fill = [c for c in np.roll(b, -(j + 1)) if c not in set(a[i : j + 1])]
        pos = [(j + 1 + k) % n for k in range(n - (j - i + 1))]
        child[pos] = fill
        return child

    best_t, best_l = None, np.inf
    for gen in range(num_generations):
        ls = lengths(pop)
        order = np.argsort(ls)
        if ls[order[0]] < best_l:
            best_l = float(ls[order[0]])
            best_t = pop[order[0]].copy()
        elite = pop[order[:n_elite]]
        children = []
        while len(children) < pop_size - n_elite:
            a, b = elite[rng.randint(n_elite)], elite[rng.randint(n_elite)]
            c = order_crossover(a, b)
            if rng.rand() < mutation_rate:
                i, j = sorted(rng.choice(n, 2, replace=False))
                c[i : j + 1] = c[i : j + 1][::-1]
            children.append(c)
        pop = np.concatenate([elite, np.stack(children)], axis=0)
        # polish with a short batched 2-opt every few generations
        if (gen + 1) % 10 == 0:
            improved, _ = two_opt_best_improvement(
                jnp.asarray(pop), jnp.asarray(dist), max_iters=10
            )
            pop = np.asarray(improved)
    ls = lengths(pop)
    if ls.min() < best_l:
        best_l = float(ls.min())
        best_t = pop[ls.argmin()].copy()
    return best_t, best_l
