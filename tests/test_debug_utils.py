"""Debug utils and validation-driven checkpoint selection."""

import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.utils.debug import assert_finite, device_memory_str
from rlsolver_tpu.train.checkpoint import CheckpointManager


def test_assert_finite():
    assert_finite({"a": jnp.ones(3), "b": (jnp.zeros(2), np.int32(1))})
    with pytest.raises(FloatingPointError, match="bad"):
        assert_finite({"bad": jnp.asarray([1.0, jnp.nan])}, name="")


def test_device_memory_str():
    s = device_memory_str()
    assert isinstance(s, str) and len(s) > 0


def test_select_best_checkpoint(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), save_every=1, keep=5)
    for step, w in ((1, 3.0), (2, 7.0), (3, 5.0)):
        mgr.save(step, {"w": jnp.asarray(w)})
    state, step, score = mgr.select_best(lambda s: float(s["w"]), like={"w": jnp.asarray(0.0)})
    assert step == 2 and score == 7.0
    state, step, score = mgr.select_best(
        lambda s: float(s["w"]), like={"w": jnp.asarray(0.0)}, maximize=False
    )
    assert step == 1 and score == 3.0
