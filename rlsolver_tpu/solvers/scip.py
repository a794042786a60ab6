"""SCIP adapter (optional, host-side).

Reference counterpart: `rlsolver/methods/scip.py:75-137` — the same MILP
formulations as the Gurobi path, solved through pyscipopt. pyscipopt is an
optional dependency here; when absent, `rlsolver_tpu.solvers.milp` (HiGHS
via scipy) provides the same formulations with bound/gap extraction, and
these entry points raise an informative ImportError.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from rlsolver_tpu.core.graph import Graph

try:  # pragma: no cover - optional dependency
    import pyscipopt as scip

    HAS_SCIP = True
except ImportError:
    scip = None
    HAS_SCIP = False


@dataclasses.dataclass
class ScipResult:
    obj: float
    bound: float
    gap: float
    solution: np.ndarray
    status: str


def _require():
    if not HAS_SCIP:
        raise ImportError(
            "pyscipopt is not installed; use rlsolver_tpu.solvers.milp (HiGHS) instead"
        )


def _extract(model, xs, n) -> ScipResult:
    sol = model.getBestSol()
    values = np.asarray([round(sol[xs[i]]) for i in range(n)], np.int64)
    obj = float(model.getObjVal())
    bound = float(model.getDualbound())
    gap = float(model.getGap())
    return ScipResult(obj, bound, gap, values, model.getStatus())


def solve_maxcut(graph: Graph, time_limit: float = 3600.0) -> ScipResult:
    """Maxcut via the XOR-linearized MILP (`scip.py` capability)."""
    _require()
    n = graph.num_nodes
    model = scip.Model("maxcut")
    model.setParam("limits/time", time_limit)
    model.hideOutput()
    xs = {i: model.addVar(vtype="B", name=f"x{i}") for i in range(n)}
    obj = 0
    for (a, b), w in zip(graph.edges, graph.weights):
        y = model.addVar(vtype="B", name=f"y{a}_{b}")
        model.addCons(y <= xs[int(a)] + xs[int(b)])
        model.addCons(y <= 2 - xs[int(a)] - xs[int(b)])
        obj = obj + float(w) * y
    model.setObjective(obj, "maximize")
    model.optimize()
    return _extract(model, xs, n)


def solve_mis(graph: Graph, time_limit: float = 3600.0) -> ScipResult:
    _require()
    n = graph.num_nodes
    model = scip.Model("mis")
    model.setParam("limits/time", time_limit)
    model.hideOutput()
    xs = {i: model.addVar(vtype="B", name=f"x{i}") for i in range(n)}
    for a, b in graph.edges:
        model.addCons(xs[int(a)] + xs[int(b)] <= 1)
    model.setObjective(sum(xs.values()), "maximize")
    model.optimize()
    return _extract(model, xs, n)


def solve_mvc(graph: Graph, time_limit: float = 3600.0) -> ScipResult:
    _require()
    n = graph.num_nodes
    model = scip.Model("mvc")
    model.setParam("limits/time", time_limit)
    model.hideOutput()
    xs = {i: model.addVar(vtype="B", name=f"x{i}") for i in range(n)}
    for a, b in graph.edges:
        model.addCons(xs[int(a)] + xs[int(b)] >= 1)
    model.setObjective(sum(xs.values()), "minimize")
    model.optimize()
    return _extract(model, xs, n)
