"""Real sycamore circuits + TNCO cost-model golden validation.

Round-1 gap: TNCO used seeded random circuits of sycamore scale; here the
actual shipped `circuit_n53_m*` node lists are loaded from the mounted
reference (`TNCO_env.py:30-525`, AST literal extraction) and the cost model
is validated against the reference's golden unit-test values
(`TNCO_env.py:1040-1045`).
"""

import math

import numpy as np
import pytest

from rlsolver_tpu.envs.tnco import (
    TensorNetwork,
    TncoEnv,
    load_reference_tnco_constant,
    sycamore_network,
)

LOG10_2 = math.log10(2.0)


@pytest.fixture(scope="module")
def net_m20():
    return sycamore_network(20)


def test_sycamore_shapes():
    net12 = sycamore_network(12)
    # n53_m12: 53-qubit, 12-cycle supremacy circuit tensor network
    assert net12.num_nodes > 200
    assert net12.run_edges > 300
    assert net12.name == "sycamore_n53_m12"


def test_node2s_conversion_covers_all_edges(net_m20):
    node2s = load_reference_tnco_constant("Node2sSycamoreN53N20COTE2")
    es = net_m20.node2s_to_edge_sort(node2s)
    assert sorted(es.tolist()) == list(range(net_m20.run_edges))


@pytest.mark.parametrize(
    "name,gold,exact",
    [
        # the golden value actually exercised by the reference's unit test
        ("Node2sSycamoreN53N20COTE2", 18.4516189880281445, True),
        ("Node2sSycamoreN53N20COTE1", 25.4781592787959994, True),
        # Test1/Test2 goldens are commented-out legacy constants in the
        # reference and sit EXACTLY log10(2) above the recomputed cost (one
        # stale factor-2); accept either value.
        ("Node2sSycamoreN53N20Test1", 25.6106868931126, False),
        ("Node2sSycamoreN53N20Test2", 25.888611588740623, False),
    ],
)
def test_golden_contraction_costs(net_m20, name, gold, exact):
    env = TncoEnv(net_m20)
    es = net_m20.node2s_to_edge_sort(load_reference_tnco_constant(name))
    val = env.log10_multiple_times_accurate(es[None])[0]
    if exact:
        assert val == pytest.approx(gold, abs=1e-4)
    else:
        assert min(abs(val - gold), abs(val - (gold - LOG10_2))) < 1e-4


def test_device_and_accurate_paths_agree(net_m20):
    import jax

    env = TncoEnv(net_m20)
    es = env.random_edge_sorts(jax.random.PRNGKey(0), 4)
    fast = np.asarray(env.log10_multiple_times(es))
    slow = env.log10_multiple_times_accurate(es)
    np.testing.assert_allclose(fast, slow, rtol=1e-5)
