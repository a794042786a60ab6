"""Unified CLI driver and the throughput autotuner."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.core.generate import generate_graph
from rlsolver_tpu.config import GraphType
from rlsolver_tpu.core.io import write_graph
from rlsolver_tpu.core.result import read_graph_result
from rlsolver_tpu.eval.autotune import find_best_num_sims, measure_throughput
from rlsolver_tpu.run import SOLVERS, main, run_one


def test_solver_registry_nonempty():
    assert {"greedy", "mcpg", "bls", "sa", "milp"} <= set(SOLVERS)


def test_cli_synthetic_graph(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["--alg", "greedy", "--graphs", "BA_32_ID0", "--no-write"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "greedy" in out and "obj=" in out


def test_cli_data_dir_writes_results(tmp_path, monkeypatch):
    data_dir = tmp_path / "data" / "syn"
    os.makedirs(data_dir)
    g = generate_graph(GraphType.BA, 24, seed=0, name="BA_24_ID0")
    write_graph(g, str(data_dir / "BA_24_ID0.txt"))
    monkeypatch.chdir(tmp_path)
    rc = main(["--alg", "greedy", "--data-dir", str(data_dir), "--prefixes", "BA"])
    assert rc == 0
    result_dir = tmp_path / "result" / "syn"
    files = os.listdir(result_dir)
    assert len(files) == 1
    header, labels = read_graph_result(str(result_dir / files[0]))
    assert header["alg_name"] == "greedy"
    assert labels.shape == (24,)


def test_cli_tsp_problem_axis(capsys):
    import os as _os

    if not _os.path.isdir("/root/reference/rlsolver/data/tsplib"):
        pytest.skip("reference data not mounted")
    rc = main(
        ["--problem", "tsp", "--alg", "nn",
         "--data-dir", "/root/reference/rlsolver/data/tsplib",
         "--prefixes", "berlin"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "berlin52" in out and "length=" in out


def test_run_one_objective_check(tmp_path):
    g = generate_graph(GraphType.ER, 20, seed=1, name="ER_20_ID1")
    value, duration, path = run_one("sa", g, seed=0, write=False, instance_path="x")
    assert value > 0 and duration >= 0 and path is None


def test_autotuner_prefers_working_sizes():
    def run(n):
        if n > 1024:
            raise MemoryError("simulated OOM")
        x = jnp.ones((n, 64))
        return jax.jit(lambda x: (x @ x.T).sum())(x)

    best, results = find_best_num_sims(run, candidates=[256, 512, 1024, 4096], reps=2)
    assert best in (256, 512, 1024)
    by_n = dict(results)
    assert by_n[4096] == 0.0  # OOM recorded, not raised
    assert measure_throughput(run, 256, reps=2) > 0


def test_cli_graph_problem_axes(capsys):
    """The reference's Problem-enum dispatch (`methods/config.py:18-32`):
    every graph-problem axis runs through the unified CLI with its own
    objective re-check."""
    from rlsolver_tpu.run import main

    for problem, alg in [
        ("mis", "greedy"),
        ("mvc", "greedy"),
        ("graph_partitioning", "greedy"),
        ("graph_coloring", "dsatur"),
    ]:
        rc = main(
            ["--problem", problem, "--alg", alg, "--graphs", "BA_32_ID0", "--no-write"]
        )
        assert rc == 0
        assert "obj=" in capsys.readouterr().out


def test_cli_milp_mis_matches_greedy_or_better(capsys):
    from rlsolver_tpu.run import main

    rc = main(["--problem", "mis", "--alg", "milp", "--graphs", "BA_24_ID0", "--no-write"])
    assert rc == 0


def test_cli_instance_problem_axes(tmp_path, capsys):
    """set_cover / knapsack axes over reference-format instance files
    (`util_read_data.py:314-344`)."""
    from rlsolver_tpu.run import main

    data = tmp_path / "data"
    data.mkdir()
    (data / "cover_0.txt").write_text("6 4\n1 2 3\n3 4\n4 5 6\n1 6\n")
    # reference layout (`util_read_data.py:314-333`): id, n, capacity, then
    # n (weight, profit) pairs
    (data / "knap_0.txt").write_text("0 4 10\n1 6\n2 5\n3 4\n4 3\n")
    rc = main(
        ["--problem", "set_cover", "--alg", "greedy", "--data-dir", str(data),
         "--prefixes", "cover"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "obj=-2.0" in out  # {1,2,3} + {4,5,6} covers optimally
    rc = main(
        ["--problem", "knapsack", "--alg", "dp", "--data-dir", str(data),
         "--prefixes", "knap", "--no-write"]
    )
    assert rc == 0
    # milp agrees with dp on the tiny instance
    rc = main(
        ["--problem", "knapsack", "--alg", "milp", "--data-dir", str(data),
         "--prefixes", "knap", "--no-write"]
    )
    assert rc == 0
    outs = [l for l in capsys.readouterr().out.splitlines() if "obj=" in l]
    assert len({l.split("obj=")[1].split()[0] for l in outs}) == 1
    # result file landed under result/ in the reference format
    results = list((tmp_path / "result").glob("cover_0*.txt"))
    assert results and "// obj: -2.0" in results[0].read_text()
