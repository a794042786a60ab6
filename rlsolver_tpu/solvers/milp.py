"""Exact MILP baselines via scipy's HiGHS backend (host-side, CPU).

Functional counterpart of the reference's Gurobi/SCIP adapters
(`rlsolver/methods/gurobi.py:272-652`, `scip.py:75-137`): build the MILP
formulation per problem, solve with a time limit, return the objective, the
best bound, and the solution. Formulations mirror the reference's:

  * maxcut: XOR linearization — y_ij >= x_i - x_j, y_ij >= x_j - x_i,
    y_ij <= x_i + x_j, y_ij <= 2 - x_i - x_j, maximize sum w_ij y_ij
    (`gurobi.py:449-456`);
  * MIS: x_i + x_j <= 1 per edge, maximize sum x (`gurobi.py:367-379`);
  * MVC: x_i + x_j >= 1 per edge, minimize sum x (`gurobi.py:355-366`);
  * set cover: sum_{s covers item} x_s >= 1, minimize sum x
    (`gurobi.py:430-448`);
  * knapsack: sum w x <= cap, maximize sum p x (`gurobi.py:414-429`);
  * graph partitioning: maxcut constraints minimized + balance
    sum x = n/2 (`gurobi.py:337-354`).

The reference requires a licensed Gurobi; this adapter makes the same
capability available out of the box (HiGHS ships with scipy). A gated
Gurobi adapter with the QUBO/MILP switch lives in
`rlsolver_tpu.solvers.gurobi`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
from scipy import sparse
from scipy.optimize import Bounds, LinearConstraint, milp

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.core.io import KnapsackInstance, SetCoverInstance


@dataclasses.dataclass
class MilpResult:
    obj: float
    bound: float
    solution: np.ndarray
    status: str


def _solve(c, constraints, integrality, bounds, time_limit, maximize):
    """scipy.optimize.milp minimizes; flip sign for maximization."""
    sign = -1.0 if maximize else 1.0
    res = milp(
        c=sign * np.asarray(c, float),
        constraints=constraints,
        integrality=integrality,
        bounds=bounds,
        options={"time_limit": time_limit, "presolve": True},
    )
    if res.x is None:
        return MilpResult(float("nan"), float("nan"), np.array([]), res.message)
    obj = sign * res.fun
    bound = sign * res.mip_dual_bound if res.mip_dual_bound is not None else obj
    return MilpResult(float(obj), float(bound), np.round(res.x).astype(int), res.message)


def solve_maxcut(graph: Graph, time_limit: float = 60.0) -> MilpResult:
    n, m = graph.num_nodes, graph.num_edges
    n0, n1, w = graph.edge_arrays()
    nv = n + m  # x nodes, y edges
    c = np.concatenate([np.zeros(n), w.astype(float)])
    rows, cols, vals, lo, hi = [], [], [], [], []

    def add_row(r, entries, lo_v, hi_v):
        for col, val in entries:
            rows.append(r)
            cols.append(col)
            vals.append(val)
        lo.append(lo_v)
        hi.append(hi_v)

    r = 0
    for e in range(m):
        i, j, y = int(n0[e]), int(n1[e]), n + e
        add_row(r, [(y, 1), (i, -1), (j, 1)], 0, np.inf); r += 1  # y >= x_i - x_j
        add_row(r, [(y, 1), (i, 1), (j, -1)], 0, np.inf); r += 1  # y >= x_j - x_i
        add_row(r, [(y, 1), (i, -1), (j, -1)], -np.inf, 0); r += 1  # y <= x_i + x_j
        add_row(r, [(y, 1), (i, 1), (j, 1)], -np.inf, 2); r += 1  # y <= 2 - x_i - x_j
    a = sparse.csr_matrix((vals, (rows, cols)), shape=(r, nv))
    cons = LinearConstraint(a, lo, hi)
    res = _solve(
        c,
        [cons],
        integrality=np.ones(nv),
        bounds=Bounds(0, 1),
        time_limit=time_limit,
        maximize=True,
    )
    if res.solution.size:
        res.solution = res.solution[:n]
    return res


def solve_mis(graph: Graph, time_limit: float = 60.0) -> MilpResult:
    n = graph.num_nodes
    n0, n1, _ = graph.edge_arrays()
    m = graph.num_edges
    a = sparse.csr_matrix(
        (np.ones(2 * m), (np.repeat(np.arange(m), 2), np.stack([n0, n1], 1).ravel())),
        shape=(m, n),
    )
    cons = LinearConstraint(a, -np.inf, 1)
    return _solve(np.ones(n), [cons], np.ones(n), Bounds(0, 1), time_limit, True)


def solve_mvc(graph: Graph, time_limit: float = 60.0) -> MilpResult:
    n = graph.num_nodes
    n0, n1, _ = graph.edge_arrays()
    m = graph.num_edges
    a = sparse.csr_matrix(
        (np.ones(2 * m), (np.repeat(np.arange(m), 2), np.stack([n0, n1], 1).ravel())),
        shape=(m, n),
    )
    cons = LinearConstraint(a, 1, np.inf)
    return _solve(np.ones(n), [cons], np.ones(n), Bounds(0, 1), time_limit, False)


def solve_set_cover(inst: SetCoverInstance, time_limit: float = 60.0) -> MilpResult:
    member = inst.membership_matrix().astype(float)  # [S, I]
    cons = LinearConstraint(sparse.csr_matrix(member.T), 1, np.inf)
    s = inst.num_sets
    return _solve(np.ones(s), [cons], np.ones(s), Bounds(0, 1), time_limit, False)


def solve_knapsack(inst: KnapsackInstance, time_limit: float = 60.0) -> MilpResult:
    n = inst.num_items
    cons = LinearConstraint(inst.weights[None, :].astype(float), -np.inf, inst.capacity)
    return _solve(inst.profits, [cons], np.ones(n), Bounds(0, 1), time_limit, True)


def solve_multiknapsack(inst, time_limit: float = 60.0) -> MilpResult:
    """Multi-dimensional knapsack (`read_multiknapsack_data` instances,
    `util_read_data.py:245-311`): max p.x s.t. C x <= rhs, x binary."""
    n = inst.profits.shape[0]
    cons = LinearConstraint(inst.constraints.astype(float), -np.inf, inst.rhs)
    return _solve(inst.profits, [cons], np.ones(n), Bounds(0, 1), time_limit, True)


def solve_graph_partitioning(graph: Graph, time_limit: float = 60.0) -> MilpResult:
    """Minimize cut subject to |side 1| == n/2 (n must be even)."""
    n, m = graph.num_nodes, graph.num_edges
    if n % 2:
        raise ValueError("graph partitioning needs an even node count")
    n0, n1, w = graph.edge_arrays()
    nv = n + m
    c = np.concatenate([np.zeros(n), w.astype(float)])
    rows, cols, vals, lo, hi = [], [], [], [], []
    r = 0
    for e in range(m):
        i, j, y = int(n0[e]), int(n1[e]), n + e
        for entries, lo_v, hi_v in [
            ([(y, 1), (i, -1), (j, 1)], 0, np.inf),  # y >= x_i - x_j
            ([(y, 1), (i, 1), (j, -1)], 0, np.inf),  # y >= x_j - x_i
        ]:
            for col, val in entries:
                rows.append(r), cols.append(col), vals.append(val)
            lo.append(lo_v)
            hi.append(hi_v)
            r += 1
    # balance row
    for i in range(n):
        rows.append(r), cols.append(i), vals.append(1)
    lo.append(n / 2)
    hi.append(n / 2)
    r += 1
    a = sparse.csr_matrix((vals, (rows, cols)), shape=(r, nv))
    res = _solve(
        c, [LinearConstraint(a, lo, hi)], np.ones(nv), Bounds(0, 1), time_limit, False
    )
    if res.solution.size:
        res.solution = res.solution[:n]
        res.obj = -res.obj  # report as the reference does: -(cut)
    return res
