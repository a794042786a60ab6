"""Checkpoint / resume for training state.

The reference only saves network `state_dict`s (`dqn.py:610-`,
`AgentBase.save_or_load_agent` `elegantrl/agents/AgentBase.py:280-299`) and
never persists optimizer/RNG/env state (SURVEY.md section 5). Here the FULL
training state — params, optimizer state, PRNG key, step counter, and the
incumbent best-solution archive — round-trips through orbax, so a resumed
run continues the exact same trajectory (envs are pure functions of
(key, params), making deterministic resume cheap).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Persist a pytree (params / opt_state / key / step / best archive).

    `path` is a directory; an existing checkpoint there is replaced.
    """
    path = os.path.abspath(path)
    state = jax.tree.map(np.asarray, jax.device_get(state))
    _checkpointer().save(path, state, force=True)


def restore_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree saved by `save_checkpoint`.

    If `like` is given, leaves are restored with its structure/dtypes
    (recommended: pass the freshly-initialized training state).
    """
    path = os.path.abspath(path)
    if like is not None:
        import orbax.checkpoint as ocp

        template = jax.tree.map(np.asarray, jax.device_get(like))
        return _checkpointer().restore(path, item=template)
    return _checkpointer().restore(path)


def latest_step_dir(root: str) -> Optional[str]:
    """Of `root/step_*` directories, the one with the largest step."""
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_"):
            try:
                steps.append((int(name[5:]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])


class CheckpointManager:
    """Periodic `step_N` checkpoints with retention, plus resume.

    Replaces the reference's time-based periodic saves (`dqn.py:405-419`)
    and `if_save_buffer` flows with a step-based policy.
    """

    def __init__(self, root: str, save_every: int = 1000, keep: int = 3):
        self.root = os.path.abspath(root)
        self.save_every = max(1, save_every)
        self.keep = max(1, keep)

    def maybe_save(self, step: int, state: Any) -> bool:
        if step % self.save_every != 0:
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state: Any) -> None:
        os.makedirs(self.root, exist_ok=True)
        save_checkpoint(os.path.join(self.root, f"step_{step}"), state)
        self._prune()

    def restore_latest(self, like: Optional[Any] = None):
        """Returns (state, step) or (None, 0) when no checkpoint exists."""
        path = latest_step_dir(self.root)
        if path is None:
            return None, 0
        step = int(os.path.basename(path)[5:])
        return restore_checkpoint(path, like), step

    def _prune(self) -> None:
        import shutil

        dirs = sorted(
            (int(n[5:]), n) for n in os.listdir(self.root) if n.startswith("step_")
        )
        for _, name in dirs[: -self.keep]:
            shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    def select_best(self, eval_fn, like: Optional[Any] = None, maximize: bool = True):
        """Evaluate every retained checkpoint and return the best
        (state, step, score) — the reference's validation-driven
        checkpoint selection (`ECO_S2V/select_best_neural_network.py:31`).
        `eval_fn(state) -> float`."""
        best = None
        if not os.path.isdir(self.root):
            return None
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("step_"):
                continue
            step = int(name[5:])
            state = restore_checkpoint(os.path.join(self.root, name), like)
            score = float(eval_fn(state))
            key = score if maximize else -score
            if best is None or key > best[0]:
                best = (key, state, step, score)
        if best is None:
            return None
        _, state, step, score = best
        return state, step, score
