"""Cross-method result aggregation: per-instance comparison tables.

Reference counterpart: `rlsolver/methods/util_statistics.py:6-244`
(`extract_data_from_file`, `process_folder`) — scans result-file trees laid
out as `<result_root>/<problem>_<method>/<instance>.txt`, extracts
`// obj / gap / obj_bound` headers, and emits per-category csv/xls
comparison tables with gap columns.

Same capability, cleaner data model: rows -> pandas DataFrame -> pivot
(instance x method) with optional gap-vs-baseline columns.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from rlsolver_tpu.core.result import read_graph_result

_TRAILING_RUN = re.compile(r"_(\d+)[a-z]*$")


def parse_result_filename(name: str) -> Dict[str, Optional[str]]:
    """`BA_100_ID0_3600.txt` -> {instance: BA_100_ID0, duration: 3600}.

    The duration tail is what `write_graph_result` appends; the optional
    trailing letters come from its collision-safe renaming.
    """
    stem = name[:-4] if name.endswith(".txt") else name
    m = _TRAILING_RUN.search(stem)
    if m:
        return {"instance": stem[: m.start()], "duration_tag": m.group(1)}
    return {"instance": stem, "duration_tag": None}


def collect_results(result_root: str) -> pd.DataFrame:
    """Scan `<result_root>/<problem>_<method>/*.txt` into a tidy frame with
    columns (problem, method, instance, obj, running_duration, obj_bound,
    gap, path). Multiple runs of the same instance keep every row."""
    rows: List[Dict] = []
    for d in sorted(os.listdir(result_root)):
        dir_path = os.path.join(result_root, d)
        if not os.path.isdir(dir_path):
            continue
        problem, _, method = d.partition("_")
        method = method or d
        for fname in sorted(os.listdir(dir_path)):
            if not fname.endswith(".txt") or fname.startswith((".", "_")):
                continue
            path = os.path.join(dir_path, fname)
            try:
                header, _ = read_graph_result(path)
            except Exception:
                continue
            meta = parse_result_filename(fname)
            rows.append(
                {
                    "problem": problem,
                    "method": method,
                    "instance": meta["instance"],
                    "obj": float(header["obj"]) if "obj" in header else np.nan,
                    "running_duration": (
                        float(header["running_duration"])
                        if header.get("running_duration", "None") != "None"
                        else np.nan
                    ),
                    "obj_bound": (
                        float(header["obj_bound"]) if "obj_bound" in header else np.nan
                    ),
                    "gap": float(header["gap"]) if "gap" in header else np.nan,
                    "path": path,
                }
            )
    return pd.DataFrame(rows)


def comparison_table(
    frame: pd.DataFrame,
    baseline_method: Optional[str] = None,
    maximize: bool = True,
    agg: str = "best",
    bound_method: Optional[str] = None,
) -> pd.DataFrame:
    """Pivot to instance x method objective table.

    `agg='best'` keeps each method's best run per instance (max when
    maximizing); 'mean' averages runs. With `baseline_method`, adds
    `gap_vs_<baseline>` columns: (baseline - obj) / |baseline| signed so
    positive = worse than baseline (the reference's gap convention)."""
    if frame.empty:
        return pd.DataFrame()
    if agg == "best":
        f = frame.groupby(["instance", "method"])["obj"].max() if maximize else (
            frame.groupby(["instance", "method"])["obj"].min()
        )
    elif agg == "mean":
        f = frame.groupby(["instance", "method"])["obj"].mean()
    else:
        raise ValueError(f"unknown agg {agg}")
    table = f.unstack("method").sort_index()
    if baseline_method is not None and baseline_method in table.columns:
        base = table[baseline_method]
        for method in list(table.columns):
            if method == baseline_method:
                continue
            sign = 1.0 if maximize else -1.0
            table[f"gap_vs_{baseline_method}:{method}"] = (
                sign * (base - table[method]) / base.abs().replace(0, np.nan)
            )
    if bound_method is not None and "obj_bound" in frame.columns:
        # the reference tables' "obj bound" column (`gurobi.py:135-156`):
        # dual bound of the time-limited exact solver, plus per-method gaps
        bounds = (
            frame[frame["method"] == bound_method]
            .groupby("instance")["obj_bound"]
            .max()
        )
        if not bounds.dropna().empty:
            table["obj_bound"] = bounds
            sign = 1.0 if maximize else -1.0
            for method in [c for c in table.columns
                           if c != "obj_bound" and not str(c).startswith("gap")]:
                table[f"gap_to_bound:{method}"] = (
                    sign * (table["obj_bound"] - table[method])
                    / table["obj_bound"].abs().replace(0, np.nan)
                )
    return table


def write_comparison_csv(
    result_root: str,
    out_path: str,
    baseline_method: Optional[str] = None,
    maximize: bool = True,
) -> pd.DataFrame:
    """End-to-end: scan + pivot + write csv (the `process_folder` flow)."""
    frame = collect_results(result_root)
    table = comparison_table(frame, baseline_method, maximize)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    table.to_csv(out_path)
    return table
