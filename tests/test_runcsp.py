"""RUN-CSP: constraint languages, instances, training, boosted decode."""

import numpy as np
import pytest

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.algos.runcsp import (
    ConstraintLanguage,
    CSPInstance,
    RunCspConfig,
    RunCspSolver,
)
from rlsolver_tpu.problems.objectives import obj_maxcut


def test_language_matrices():
    mc = ConstraintLanguage.maxcut()
    m = mc.matrices()["NEQ"]
    np.testing.assert_array_equal(m, [[0, 1], [1, 0]])
    col = ConstraintLanguage.coloring(3).matrices()["NEQ"]
    np.testing.assert_array_equal(col, 1 - np.eye(3))
    mis = ConstraintLanguage.mis().matrices()["NAND"]
    np.testing.assert_array_equal(mis, [[1, 1], [1, 0]])


def test_instance_conflicts_counts():
    lang = ConstraintLanguage.maxcut()
    g = graph_from_name("BA_16_ID0")
    inst = CSPInstance.from_graph(g, lang, "NEQ")
    assert inst.num_clauses == g.num_edges
    rng = np.random.RandomState(0)
    a = rng.randint(0, 2, 16)
    # conflicts = uncut edges
    cut = obj_maxcut(a, g)
    assert inst.count_conflicts(a) == g.num_edges - cut


def small_cfg():
    return RunCspConfig(state_size=32, iterations=6, epochs=18, lr=3e-3, seed=0)


def test_runcsp_maxcut_beats_random():
    lang = ConstraintLanguage.maxcut()
    g = graph_from_name("BA_24_ID0")
    inst = CSPInstance.from_graph(g, lang, "NEQ")
    solver = RunCspSolver(lang, small_cfg())
    params, history = solver.train([inst])
    assert history[-1] < history[0]  # loss decreases
    a, conflicts = solver.boosted_predict(params, inst, num_boosts=4)
    cut = obj_maxcut(a, g)
    assert conflicts == g.num_edges - cut
    assert cut > 0.5 * g.total_weight  # beats the random expectation


def test_runcsp_coloring_random_instances():
    lang = ConstraintLanguage.coloring(3)
    insts = [CSPInstance.generate_random(20, 40, lang, seed=s) for s in range(2)]
    solver = RunCspSolver(lang, small_cfg())
    params, history = solver.train(insts)
    a, conflicts = solver.boosted_predict(params, insts[0], num_boosts=4)
    assert a.shape == (20,) and set(np.unique(a)) <= {0, 1, 2}
    # random 3-coloring violates ~1/3 of constraints; trained should beat it
    assert conflicts <= insts[0].num_clauses // 3 + 2


def test_xu_generator_forced_satisfiable():
    inst, hidden = CSPInstance.generate_xu(30, domain=3, density=1.5, seed=7)
    assert inst.count_conflicts(hidden) == 0  # planted solution satisfies
    assert inst.num_clauses > 30  # non-trivial density
    # every constraint joins differently-colored endpoints
    for a, b in inst.clauses["NEQ"]:
        assert hidden[a] != hidden[b]


def test_runcsp_max2sat_language():
    lang = ConstraintLanguage.max2sat()
    inst = CSPInstance.generate_random(12, 30, lang, seed=1)
    solver = RunCspSolver(lang, small_cfg())
    params, _ = solver.train([inst])
    a, conflicts = solver.boosted_predict(params, inst, num_boosts=2)
    # random assignment violates 1/4 of OR clauses in expectation
    assert conflicts <= inst.num_clauses // 4 + 2
