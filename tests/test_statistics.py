"""Result-tree aggregation and comparison tables."""

import os

import numpy as np
import pytest

from rlsolver_tpu.eval.statistics import (
    collect_results,
    comparison_table,
    parse_result_filename,
    write_comparison_csv,
)


def _write(path, obj, alg, duration=10.0, bound=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(f"// obj: {obj}\n")
        f.write(f"// running_duration: {duration}\n")
        f.write(f"// alg_name: {alg}\n")
        if bound is not None:
            f.write(f"// obj_bound: {bound}\n")
        for i in range(4):
            f.write(f"{i+1} 1\n")


def test_parse_result_filename():
    assert parse_result_filename("BA_100_ID0_3600.txt") == {
        "instance": "BA_100_ID0",
        "duration_tag": "3600",
    }
    # result files always carry the duration tail (write_graph_result);
    # collision letters after the digits are part of the tail
    assert parse_result_filename("gset_14_60.txt")["instance"] == "gset_14"
    assert parse_result_filename("gset_14_60ab.txt")["instance"] == "gset_14"


def test_collect_and_pivot(tmp_path):
    root = str(tmp_path / "result")
    _write(f"{root}/maxcut_greedy/BA_100_ID0_10.txt", 120, "greedy")
    _write(f"{root}/maxcut_greedy/BA_200_ID0_10.txt", 260, "greedy")
    _write(f"{root}/maxcut_mcpg/BA_100_ID0_10.txt", 131, "mcpg")
    _write(f"{root}/maxcut_mcpg/BA_100_ID0_12.txt", 133, "mcpg")  # second run
    _write(f"{root}/maxcut_mcpg/BA_200_ID0_10.txt", 271, "mcpg")
    _write(f"{root}/maxcut_gurobi/BA_100_ID0_3600.txt", 132, "gurobi", bound=135)
    _write(f"{root}/maxcut_gurobi/BA_200_ID0_3600.txt", 270, "gurobi", bound=280)

    frame = collect_results(root)
    assert len(frame) == 7
    assert set(frame.method) == {"greedy", "mcpg", "gurobi"}
    assert frame[frame.method == "gurobi"].obj_bound.notna().all()

    table = comparison_table(frame, baseline_method="gurobi")
    # best-of-runs: mcpg BA_100 should be 133
    assert table.loc["BA_100_ID0", "mcpg"] == 133
    # gap sign: mcpg beat gurobi on BA_100 -> negative gap (better)
    assert table.loc["BA_100_ID0", "gap_vs_gurobi:mcpg"] < 0
    assert table.loc["BA_200_ID0", "gap_vs_gurobi:greedy"] > 0

    out = str(tmp_path / "cmp.csv")
    t2 = write_comparison_csv(root, out, baseline_method="gurobi")
    assert os.path.exists(out)
    assert np.allclose(
        t2[["greedy", "mcpg", "gurobi"]].values,
        table[["greedy", "mcpg", "gurobi"]].values,
    )


def test_bound_column_and_gaps(tmp_path):
    """`bound_method` adds the reference's "obj bound" column plus
    per-method gap-to-bound columns (`gurobi.py:135-156` capability)."""
    root = str(tmp_path / "result")
    _write(f"{root}/maxcut_mcpg/BA_100_ID0_10.txt", 131, "mcpg")
    _write(f"{root}/maxcut_milp/BA_100_ID0_60.txt", 128, "milp", bound=140)
    frame = collect_results(root)
    table = comparison_table(frame, bound_method="milp")
    assert table.loc["BA_100_ID0", "obj_bound"] == 140
    # mcpg gap to bound: (140 - 131) / 140
    assert table.loc["BA_100_ID0", "gap_to_bound:mcpg"] == pytest.approx(9 / 140)


def test_cli_milp_writes_bound(tmp_path, monkeypatch):
    """--alg milp result files carry obj_bound/gap headers end-to-end."""
    import rlsolver_tpu.run as run_mod
    from rlsolver_tpu.core.result import read_graph_result

    monkeypatch.chdir(tmp_path)
    (tmp_path / "data").mkdir()
    # small instance so HiGHS solves instantly
    rc = run_mod.main(
        ["--alg", "milp", "--graphs", "BA_16_ID0", "--milp-time-limit", "30"]
    )
    assert rc == 0
    result_dir = tmp_path / "result"
    files = list(result_dir.glob("**/*.txt"))
    assert files
    header, _ = read_graph_result(str(files[0]))
    assert "obj_bound" in header and "gap" in header
    assert float(header["obj_bound"]) >= float(header["obj"]) - 1e-6
