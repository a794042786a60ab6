"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on `xla_force_host_platform_device_count=8` CPU devices (the
driver separately dry-run-compiles the multi-chip path via
`__graft_entry__.dryrun_multichip`).
"""

import os

# Two lanes:
#   default             — force CPU (8 virtual devices), run everything NOT
#                         marked `tpu`;
#   RLSOLVER_TPU_TESTS=1 — keep the real TPU backend and run ONLY the tests
#                         marked `tpu` (the fused-kernel hardware lane:
#                         `RLSOLVER_TPU_TESTS=1 pytest tests/ -m tpu`).
TPU_LANE = os.environ.get("RLSOLVER_TPU_TESTS") == "1"

if not TPU_LANE:
    # Force CPU: the session environment pins JAX_PLATFORMS=axon (a remote
    # TPU tunnel registered by sitecustomize at interpreter start, so jax is
    # already imported by the time pytest loads this file). Overriding the
    # env var alone is not enough — use jax.config, which wins as long as no
    # backend has been initialized yet.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU backend (fused Pallas kernels)"
    )


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if TPU_LANE:
        skip = _pytest.mark.skip(reason="TPU lane runs only `tpu`-marked tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = _pytest.mark.skip(
            reason="needs real TPU (run: RLSOLVER_TPU_TESTS=1 pytest -m tpu)"
        )
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)

import numpy as np
import pytest

import rlsolver_tpu  # noqa: F401


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_graphs():
    """A few deterministic small instances used across test modules."""
    from rlsolver_tpu.config import GraphType
    from rlsolver_tpu.core.generate import generate_graph

    return {
        "BA_32": generate_graph(GraphType.BA, 32, seed=0),
        "ER_24": generate_graph(GraphType.ER, 24, seed=1),
        "PL_40": generate_graph(GraphType.PL, 40, seed=2),
    }


@pytest.fixture(scope="session")
def gset14_path():
    """The toy gset instance shipped with the reference (14 nodes, 40 edges)."""
    path = "/root/reference/rlsolver/data/gset/gset_14.txt"
    if not os.path.exists(path):
        pytest.skip("reference data not mounted")
    return path
