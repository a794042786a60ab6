"""Golden-value and cross-implementation tests for objectives (host numpy)."""

import numpy as np
import pytest

from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.core.io import KnapsackInstance, SetCoverInstance
from rlsolver_tpu.problems import objectives as obj


@pytest.fixture
def tri():
    # triangle + pendant: edges (0,1),(1,2),(0,2),(2,3)
    return Graph.from_edge_list(4, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)])


def test_maxcut_golden(tri):
    assert obj.obj_maxcut([0, 0, 0, 0], tri) == 0
    assert obj.obj_maxcut([0, 1, 0, 1], tri) == 3  # edges (0,1),(1,2),(2,3) cut
    assert obj.obj_maxcut([0, 1, 1, 0], tri) == 3
    assert obj.obj_maxcut([1, 1, 0, 1], tri) == 3


def test_maxcut_weighted():
    g = Graph.from_edge_list(3, [(0, 1, 2.0), (1, 2, 3.0)])
    assert obj.obj_maxcut([0, 1, 0], g) == 5.0
    assert obj.obj_maxcut([0, 0, 1], g) == 3.0


def test_graph_partitioning(tri):
    assert obj.obj_graph_partitioning([0, 0, 1, 1], tri) == -2  # cut edges (0,2),(1,2)
    assert obj.obj_graph_partitioning([0, 1, 1, 1], tri) == -obj.INF  # unbalanced
    assert obj.obj_graph_partitioning([0, 1, 0, 1], tri) == -3


def test_mvc(tri):
    assert obj.obj_minimum_vertex_cover([0, 1, 1, 0], tri) == -2
    assert obj.obj_minimum_vertex_cover([1, 0, 1, 0], tri) == -2
    assert obj.obj_minimum_vertex_cover([0, 0, 1, 0], tri) == -obj.INF  # (0,1) uncovered


def test_mis(tri):
    assert obj.obj_maximum_independent_set([0, 0, 0, 1], tri) == 1
    assert obj.obj_maximum_independent_set([1, 0, 0, 1], tri) == 2
    assert obj.obj_maximum_independent_set([1, 1, 0, 0], tri) == -obj.INF


def test_set_cover():
    inst = SetCoverInstance(4, ((1, 2), (2, 3), (3, 4), (1, 2, 3, 4)))
    assert obj.obj_set_cover([0, 0, 0, 1], inst) == -1
    assert obj.obj_set_cover([1, 0, 1, 0], inst) == -2
    assert obj.obj_set_cover([1, 1, 0, 0], inst) == -obj.INF
    assert obj.obj_set_cover_ratio([1, 0, 0, 0], inst) == 0.5


def test_graph_coloring(tri):
    assert obj.obj_graph_coloring([0, 1, 2, 0], tri) == -3
    assert obj.obj_graph_coloring([0, 1, 1, 0], tri) == -obj.INF


def test_knapsack():
    inst = KnapsackInstance(0, 10.0, np.array([5.0, 6.0, 4.0]), np.array([10.0, 13.0, 7.0]))
    assert obj.obj_knapsack([1, 0, 1], inst) == 17.0
    assert obj.obj_knapsack([1, 1, 0], inst) == -obj.INF  # 11 > 10


def test_number_partitioning():
    assert obj.obj_number_partitioning([1, 0, 0], [4, 2, 2]) == 0
    assert obj.obj_number_partitioning([1, 1, 0], [4, 2, 2]) == -4


def test_tsp():
    dist = np.array([[0, 1, 2], [1, 0, 1], [2, 1, 0]], float)
    assert obj.obj_tsp([0, 1, 2], dist) == -(1 + 1 + 2)
