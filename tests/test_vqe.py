"""Pure-JAX statevector VQE baseline."""

import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.core.io import read_graph
from rlsolver_tpu.solvers.vqe import (
    VQEConfig,
    basis_bits,
    cz_chain_mask,
    maxcut_diagonal,
    two_local_state,
    vqe_maxcut,
)
from rlsolver_tpu.problems.objectives import obj_maxcut


def test_basis_bits_and_diagonal():
    g = graph_from_name("BA_8_ID0")
    diag = np.asarray(maxcut_diagonal(g))
    assert diag.shape == (256,)
    bits = np.asarray(basis_bits(8))
    # spot-check a few basis states against the host objective
    for x in (0, 1, 37, 255):
        assert diag[x] == obj_maxcut(bits[x].astype(int), g)
    # complement symmetry of the cut
    np.testing.assert_allclose(diag, diag[::-1])


def test_ansatz_state_normalized():
    n, reps = 6, 2
    params = jnp.linspace(-1.0, 1.0, (reps + 1) * n)
    state = two_local_state(params, n, reps, cz_chain_mask(n))
    assert state.shape == (64,)
    assert abs(float(jnp.sum(jnp.abs(state) ** 2)) - 1.0) < 1e-5


def test_zero_params_give_all_zero_state():
    n, reps = 5, 1
    params = jnp.zeros((reps + 1) * n)
    state = np.asarray(two_local_state(params, n, reps, cz_chain_mask(n)))
    assert abs(abs(state[0]) - 1.0) < 1e-5  # |00000> untouched by RY(0)/CZ


def test_vqe_maxcut_small_graph():
    g = read_graph("/root/reference/rlsolver/data/gset/gset_14.txt")
    # gset_14 toy: 14 nodes, best cut 29 (verify skill); VQE should land near
    bits, cut, history = vqe_maxcut(g, VQEConfig(reps=2, num_iters=250, seed=1))
    assert cut == obj_maxcut(bits.astype(int), g)
    assert cut >= 25  # comfortably above the random expectation (~20)
    assert np.isfinite(history).all()
