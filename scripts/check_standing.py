"""Flagship-standing check (VERDICT round-2 item #1).

Prints per-(dist, N) cell averages for GA / MCPG / L2A from
results_quality/dist_table.csv and flags every cell where L2A < GA
(required everywhere) or, on BA rows, L2A < MCPG (the reference's
dREINFORCE relative standing, /root/reference/README.md:356-371).
"""

from __future__ import annotations

import collections
import csv
import sys

IN = "results_quality/dist_table.csv"


def main():
    cells = collections.defaultdict(lambda: collections.defaultdict(dict))
    for r in csv.reader(open(IN)):
        if r and r[0] != "dist":
            cells[(r[0], int(r[1]))][r[3]][int(r[2])] = float(r[4])
    bad = 0
    for (dist, n) in sorted(cells, key=lambda k: (k[0], k[1])):
        algs = cells[(dist, n)]
        def avg(a):
            v = algs.get(a)
            return sum(v.values()) / len(v) if v else None
        ga, mcpg, l2a = avg("ga"), avg("mcpg"), avg("l2a")
        if l2a is None:
            continue
        flags = []
        if ga is not None and l2a < ga - 1e-9:
            flags.append("L2A<GA")
        if dist == "BA" and mcpg is not None and l2a < mcpg - 1e-9:
            flags.append("L2A<MCPG")
        bad += bool(flags)
        print(
            f"{dist}_{n:<5d} GA {ga if ga is not None else float('nan'):7.1f}"
            f"  MCPG {mcpg if mcpg is not None else float('nan'):7.1f}"
            f"  L2A {l2a:7.1f}  {' '.join(flags) or 'ok'}"
        )
    print(f"{bad} failing cells")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
