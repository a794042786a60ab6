"""Structured metrics stream + throughput gauges.

Replaces the reference's print-based observability (SURVEY.md section 5):
`Evaluator.logging_print` (`util_evaluator.py:134`), the JSON scalar
`Logger` (`ECO_S2V/src/agents/util.py:373-445`), inline samples/sec
counters (`MCPG.py:404-413`, `dqn.py:336-338`), and the csv `Recorder`.
One JSONL stream per run; each record carries step + wall time; a
`Throughput` gauge reproduces the samples-per-second accounting.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics stream (machine-readable observability)."""

    def __init__(self, path: Optional[str] = None, print_every: int = 0):
        self.path = path
        self.print_every = print_every
        self._fh = None
        self._n = 0
        self.start_time = time.time()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")

    def log(self, step: int, **scalars) -> Dict:
        rec = {"step": int(step), "time": round(time.time() - self.start_time, 4)}
        for k, v in scalars.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        self._n += 1
        if self.print_every and self._n % self.print_every == 0:
            print(" ".join(f"{k}={v}" for k, v in rec.items()))
        return rec

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class Throughput:
    """Samples/sec gauge (`num_samples_per_second` semantics, MCPG.py:404)."""

    def __init__(self):
        self.t0 = time.time()
        self.total = 0

    def add(self, n: int) -> None:
        self.total += int(n)

    @property
    def per_second(self) -> float:
        dt = time.time() - self.t0
        return self.total / dt if dt > 0 else 0.0


def should_stop(run_dir: str) -> bool:
    """Graceful-stop sentinel: a `stop` file in the run dir ends training
    (reference: `os.path.exists(f"{cwd}/stop")` `elegantrl/train/run.py:130`).
    """
    return os.path.exists(os.path.join(run_dir, "stop"))
