"""Core layer tests: graph IO, generators, codec, result files."""

import os

import numpy as np
import pytest

from rlsolver_tpu.config import GraphType
from rlsolver_tpu.core.encode import SolutionCodec
from rlsolver_tpu.core.generate import generate_graph, graph_from_name
from rlsolver_tpu.core.graph import Graph
from rlsolver_tpu.core.io import read_graph, write_graph
from rlsolver_tpu.core.result import read_graph_result, write_graph_result


def test_graph_from_edge_list_dedup_and_symmetry():
    g = Graph.from_edge_list(4, [(0, 1, 1.0), (1, 0, 2.0), (2, 3, 1.0)])
    assert g.num_edges == 2
    # reversed duplicate keeps the last weight, like nx.Graph.add_edge
    assert g.weights[0] == 2.0
    a = g.adjacency_dense()
    np.testing.assert_array_equal(a, a.T)
    assert a[0, 1] == 2.0 and a[2, 3] == 1.0


def test_graph_roundtrip_txt(tmp_path, small_graphs):
    g = small_graphs["BA_32"]
    path = str(tmp_path / "g.txt")
    write_graph(g, path)
    g2 = read_graph(path)
    assert g2.num_nodes == g.num_nodes
    np.testing.assert_array_equal(g2.edges, g.edges)
    np.testing.assert_allclose(g2.weights, g.weights)


def test_read_reference_gset(gset14_path):
    g = read_graph(gset14_path)
    assert g.num_nodes == 14
    assert g.num_edges == 40
    # 1-indexed in file -> 0-indexed here
    assert g.edges.min() == 0
    assert g.edges.max() == 13


def test_generators_are_seeded():
    for gt in GraphType:
        g1 = generate_graph(gt, 64, seed=7)
        g2 = generate_graph(gt, 64, seed=7)
        g3 = generate_graph(gt, 64, seed=8)
        np.testing.assert_array_equal(g1.edges, g2.edges)
        assert g1.num_edges != g3.num_edges or not np.array_equal(g1.edges, g3.edges)


def test_graph_from_name():
    g = graph_from_name("BA_100_ID7")
    assert g.num_nodes == 100
    assert g.name == "BA_100_ID7"
    # BA with m=4: m edges per added node
    assert g.num_edges == (100 - 4) * 4


def test_padded_neighbors_consistency(small_graphs):
    g = small_graphs["ER_24"]
    nbrs, nbr_w, deg = g.padded_neighbors()
    assert nbrs.shape == nbr_w.shape
    np.testing.assert_array_equal(deg, g.degrees())
    a = g.adjacency_dense()
    for i in range(g.num_nodes):
        got = sorted(nbrs[i, : deg[i]].tolist())
        want = sorted(np.nonzero(a[i])[0].tolist())
        assert got == want
        assert (nbrs[i, deg[i] :] == g.num_nodes).all()
        assert (nbr_w[i, deg[i] :] == 0).all()


def test_greedy_coloring_is_proper(small_graphs):
    for g in small_graphs.values():
        color, k = g.greedy_coloring()
        assert k >= 1
        for a, b in g.edges:
            assert color[a] != color[b]


def test_codec_roundtrip():
    rng = np.random.default_rng(3)
    for n in [5, 6, 64, 121, 800]:
        codec = SolutionCodec(n)
        bits = rng.integers(0, 2, n).astype(bool)
        s = codec.bits_to_str(bits)
        back = codec.str_to_bits(s)
        np.testing.assert_array_equal(back, bits)


def test_codec_matches_reference_oracle():
    """Decode the reference's stored G14 best solution and re-encode it."""
    x_g14 = (
        " 11Re2ycMx2zCiEhQl5ey$HyYnkUhDVE6KkPnuuhcWXwUO9Rn1fxrt_cn_g6iZFQex1YpwjD_j7KzbNN7"
        "1qVekltv3QscNQJjrnrqHfsnOKWJzg9nJhZ$qh69 $X_BvBQirx$i3F "
    )
    codec = SolutionCodec(800)
    bits = codec.str_to_bits(x_g14)
    assert bits.shape == (800,)
    assert 0 < bits.sum() < 800
    s2 = codec.bits_to_str(bits)
    assert s2.replace("\n", "").replace(" ", "") == x_g14.replace("\n", "").replace(" ", "")


def test_result_file_roundtrip(tmp_path):
    instance = str(tmp_path / "data" / "BA_10_ID0.txt")
    os.makedirs(os.path.dirname(instance))
    open(instance, "w").write("10 0\n")
    sol = np.array([0, 1, 0, 1, 1, 0, 0, 1, 0, 1])
    path = write_graph_result(123.0, 4.5, 10, "test_alg", sol, instance)
    assert "result" in path
    header, labels = read_graph_result(path)
    assert header["obj"] == "123.0"
    assert header["alg_name"] == "test_alg"
    np.testing.assert_array_equal(labels, sol)
    # collision-safe rename
    path2 = write_graph_result(124.0, 4.5, 10, "test_alg", sol, instance)
    assert path2 != path
