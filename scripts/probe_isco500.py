"""Bisect the BA_500 ISCO TPU-worker crash (round-4 campaign blocker).

`solve_maxcut_isco_cell` on the BA_500 cell (G=10, batch 256, chain 1000)
crashes the remote TPU worker deterministically ("kernel fault"), in a
fresh process, while N=100-400 cells run clean. This prober runs a ladder
of variants, EACH IN ITS OWN SUBPROCESS (a worker crash kills the
client's backend for good), and prints PASS/CRASH per variant so the
campaign can be re-queued with the first passing configuration.

Usage: python scripts/probe_isco500.py   (needs the TPU idle)
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (sys.path + axon backend repair)

import os
import subprocess
import sys

VARIANTS = [
    # (tag, n_graphs, batch, chain, mode)
    ("baseline-crash", 10, 256, 1000, "dense"),
    ("chain-800", 10, 256, 800, "dense"),
    ("batch-128", 10, 128, 1000, "dense"),
    ("graphs-5", 5, 256, 1000, "dense"),
    ("sparse", 10, 256, 1000, "sparse"),
]

CHILD = r"""
import sys
from rlsolver_tpu.algos.isco import ISCOConfig, solve_maxcut_isco_cell
from rlsolver_tpu.core.generate import graph_from_name

tag, g_cnt, batch, chain, mode = sys.argv[1:6]
gs = [graph_from_name(f"BA_500_ID{i}") for i in range(int(g_cnt))]
cfg = ISCOConfig(batch_size=int(batch), chain_length=int(chain), seed=0)
bits, vals = solve_maxcut_isco_cell(gs, cfg, mode=mode)
print(f"OK {tag}: avg {sum(map(float, vals))/len(vals):.1f}", flush=True)
"""


def main():
    results = []
    for tag, g_cnt, batch, chain, mode in VARIANTS:
        r = subprocess.run(
            [sys.executable, "-u", "-c", CHILD, tag, str(g_cnt), str(batch),
             str(chain), mode],
            capture_output=True, text=True, timeout=1200,
            env=os.environ,
        )
        ok = r.returncode == 0 and "OK" in r.stdout
        tail = (r.stdout + r.stderr).strip().splitlines()
        tail = tail[-1][:140] if tail else ""
        results.append((tag, ok, tail))
        print(f"{'PASS' if ok else 'CRASH'} {tag}: {tail}", flush=True)
        if tag == "baseline-crash" and ok:
            print("baseline passes — crash not reproducible; stop", flush=True)
            break
    print("summary:", {t: ("pass" if ok else "crash") for t, ok, _ in results},
          flush=True)


if __name__ == "__main__":
    main()
