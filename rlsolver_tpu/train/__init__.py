"""Unified training runtime: loop, checkpoint/resume, metrics stream.

Replaces the reference's ElegantRL Learner/Worker/Evaluator process topology
(`elegantrl/train/run.py`) with a single-process SPMD loop (see
`rlsolver_tpu.train.runner`).
"""

from rlsolver_tpu.train.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from rlsolver_tpu.train.metrics import MetricsLogger, Throughput, should_stop
from rlsolver_tpu.train.runner import LoopConfig, TrainLoop

__all__ = [
    "CheckpointManager",
    "LoopConfig",
    "MetricsLogger",
    "Throughput",
    "TrainLoop",
    "restore_checkpoint",
    "save_checkpoint",
    "should_stop",
]
