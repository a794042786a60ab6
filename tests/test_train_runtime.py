"""Train runtime: loop, checkpoint round-trip, resume, stop sentinel."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlsolver_tpu.train import (
    CheckpointManager,
    LoopConfig,
    MetricsLogger,
    TrainLoop,
    restore_checkpoint,
    save_checkpoint,
)


def quadratic_step():
    """A tiny 'training': SGD on f(w) = |w|^2, state = (w, opt_state, key)."""
    opt = optax.sgd(0.1)

    def step_fn(state):
        w, opt_state, key = state
        grads = 2.0 * w
        updates, opt_state = opt.update(grads, opt_state)
        w = optax.apply_updates(w, updates)
        key, _ = jax.random.split(key)
        return (w, opt_state, key), {"loss": jnp.sum(w * w)}

    w0 = jnp.asarray([1.0, -2.0, 3.0])
    return step_fn, (w0, opt.init(w0), jax.random.PRNGKey(0))


def test_checkpoint_roundtrip(tmp_path):
    _, state = quadratic_step()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, like=state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_manager_retention_and_latest(tmp_path):
    _, state = quadratic_step()
    mgr = CheckpointManager(str(tmp_path / "ckpts"), save_every=1, keep=2)
    for step in (1, 2, 3):
        mgr.save(step, state)
    names = sorted(os.listdir(tmp_path / "ckpts"))
    assert names == ["step_2", "step_3"]
    _, step = mgr.restore_latest(like=state)
    assert step == 3


def test_loop_trains_logs_and_resumes(tmp_path):
    step_fn, state = quadratic_step()
    run_dir = str(tmp_path / "run")
    cfg = LoopConfig(
        run_dir=run_dir, total_steps=5, log_every=1, checkpoint_every=2
    )
    final = TrainLoop(cfg, step_fn).run(state)
    w = np.asarray(final[0])
    assert (np.abs(w) < np.abs(np.asarray(state[0]))).all()

    lines = [
        json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    assert len(lines) == 5
    assert lines[-1]["step"] == 5 and lines[-1]["loss"] < lines[0]["loss"]

    # resume continues from the persisted step (final save at step 5)
    cfg2 = LoopConfig(
        run_dir=run_dir, total_steps=8, log_every=1, checkpoint_every=2, resume=True
    )
    final2 = TrainLoop(cfg2, step_fn).run(final)
    lines2 = [
        json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    assert lines2[-1]["step"] == 8
    assert float(np.sum(np.asarray(final2[0]) ** 2)) < lines[-1]["loss"]


def test_stop_sentinel(tmp_path):
    step_fn, state = quadratic_step()
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    open(os.path.join(run_dir, "stop"), "w").close()
    cfg = LoopConfig(run_dir=run_dir, total_steps=100, log_every=1)
    TrainLoop(cfg, step_fn).run(state)
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert len(lines) == 1  # stopped after the first step
