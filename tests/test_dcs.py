"""Compressed sensing: ISTA, LISTA, and deep compressed sensing."""

import jax
import jax.numpy as jnp
import numpy as np

from rlsolver_tpu.algos.dcs import (
    DCS,
    DCSConfig,
    Generator,
    Lista,
    ista,
    sparse_signals,
)


def test_sparse_signals_sparsity():
    x = sparse_signals(jax.random.PRNGKey(0), 16, 32, 5)
    nz = np.asarray((np.asarray(x) != 0).sum(axis=1))
    assert (nz == 5).all()


def test_ista_recovers_sparse_signal():
    key = jax.random.PRNGKey(1)
    n, m, k = 64, 32, 4
    f = jax.random.normal(jax.random.fold_in(key, 0), (m, n)) / np.sqrt(m)
    x = sparse_signals(jax.random.fold_in(key, 1), 8, n, k)
    y = x @ f.T
    xhat = ista(f, y, lam=0.02, num_iters=1000)
    rel = np.linalg.norm(np.asarray(xhat - x), axis=1) / np.linalg.norm(
        np.asarray(x), axis=1
    )
    # most signals recover to high precision; a few supports are inherently
    # hard at m = n/2 — bound the median tightly and the worst loosely
    assert np.median(rel) < 0.1
    assert (rel < 0.6).all()


def test_lista_trains_below_ista_iterations():
    key = jax.random.PRNGKey(2)
    n, m, k = 32, 16, 3
    f = jax.random.normal(jax.random.fold_in(key, 0), (m, n)) / np.sqrt(m)
    model = Lista(m, n, num_layers=6)
    params = model.init(key, jnp.zeros((1, m)))
    import optax

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        x = sparse_signals(rng, 64, n, 3)
        y = x @ f.T

        def loss_fn(p):
            return jnp.mean(jnp.sum((model.apply(p, y) - x) ** 2, axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    kk = jax.random.PRNGKey(3)
    for i in range(150):
        kk, k1 = jax.random.split(kk)
        params, opt_state, loss = step(params, opt_state, k1)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])


def test_dcs_trains_and_reduces_recovery_error():
    cfg = DCSConfig(
        signal_dim=32, latent_dim=8, num_measure=16, sparsity=3,
        num_grad_iters=3, num_epochs=120, batch_size=32, lr=2e-3,
    )
    dcs = DCS(cfg)
    err0 = dcs.recovery_error(64)
    history = dcs.train()
    err1 = dcs.recovery_error(64)
    assert history[-1] < history[0]
    assert err1 < err0
