"""MaxSAT / QUBO / Cheeger / MIMO problem envs + generic MCPG driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.core.generate import graph_from_name
from rlsolver_tpu.problems.maxsat import MaxSatEnv, MaxSatInstance
from rlsolver_tpu.problems.qubo import QuboEnv, maxcut_to_qubo, read_qubo
from rlsolver_tpu.problems.cheeger import CheegerEnv
from rlsolver_tpu.problems.mimo import (
    MimoEnv,
    detect_ml_brute,
    detect_mmse,
    detect_zf,
    generate_mimo,
)
from rlsolver_tpu.algos.mcpg_multi import (
    MultiMCPGConfig,
    cheeger_problem,
    maxsat_problem,
    mimo_problem,
    qubo_problem,
    solve_mcpg,
)


# ------------------------------------------------------------------- maxsat
def brute_maxsat(inst):
    best = -1
    n = inst.num_vars
    env = MaxSatEnv(inst)
    bits = ((np.arange(2**n)[:, None] >> np.arange(n)) & 1).astype(bool)
    vals = np.asarray(env.obj(jnp.asarray(bits)))
    return float(vals.max())


@pytest.fixture(scope="module")
def sat_inst():
    rng = np.random.RandomState(0)
    clauses = []
    n = 10
    for _ in range(40):
        k = rng.randint(2, 4)
        vs = rng.choice(n, size=k, replace=False) + 1
        signs = rng.choice([-1, 1], size=k)
        clauses.append(list(vs * signs))
    return MaxSatInstance.from_clauses(n, clauses)


def test_maxsat_obj_matches_python(sat_inst):
    env = MaxSatEnv(sat_inst)
    rng = np.random.RandomState(1)
    bits = rng.rand(8, sat_inst.num_vars) < 0.5
    dev = np.asarray(env.obj(jnp.asarray(bits)))
    # python twin
    for b in range(8):
        count = 0
        for ci in range(sat_inst.num_clauses):
            sat = False
            for j in range(sat_inst.clause_vars.shape[1]):
                s = sat_inst.clause_signs[ci, j]
                if s == 0:
                    continue
                v = sat_inst.clause_vars[ci, j]
                lit = bits[b, v] if s > 0 else not bits[b, v]
                sat = sat or lit
            count += float(sat_inst.weights[ci]) * sat
        assert abs(dev[b] - count) < 1e-5


def test_maxsat_sweep_improves(sat_inst):
    env = MaxSatEnv(sat_inst)
    key = jax.random.PRNGKey(2)
    bits = env.random_bits(key, 16)
    v0 = env.obj(bits)
    out = jax.jit(lambda k, b: env.sweep(k, b, num_sweeps=2, noise=0.0))(key, bits)
    v1 = env.obj(out)
    assert float(v1.mean()) >= float(v0.mean())


def test_maxsat_cnf_roundtrip(tmp_path, sat_inst):
    p = tmp_path / "t.cnf"
    lines = [f"p cnf {sat_inst.num_vars} {sat_inst.num_clauses}"]
    for ci in range(sat_inst.num_clauses):
        lits = [
            str(int(sat_inst.clause_signs[ci, j]) * (int(sat_inst.clause_vars[ci, j]) + 1))
            for j in range(sat_inst.clause_vars.shape[1])
            if sat_inst.clause_signs[ci, j] != 0
        ]
        lines.append(" ".join(lits) + " 0")
    p.write_text("\n".join(lines) + "\n")
    inst2 = MaxSatInstance.from_cnf(str(p))
    env1, env2 = MaxSatEnv(sat_inst), MaxSatEnv(inst2)
    bits = jnp.asarray(np.random.RandomState(3).rand(4, sat_inst.num_vars) < 0.5)
    np.testing.assert_allclose(np.asarray(env1.obj(bits)), np.asarray(env2.obj(bits)))


def test_mcpg_maxsat_near_optimal(sat_inst):
    opt = brute_maxsat(sat_inst)
    res = solve_mcpg(
        maxsat_problem(MaxSatEnv(sat_inst)),
        MultiMCPGConfig(num_chains=16, repeat_times=4, num_rounds=12, seed=0),
    )
    assert res.best_score >= opt - 1.0  # within one clause of optimum


# --------------------------------------------------------------------- qubo
def test_qubo_energy_and_sweep():
    rng = np.random.RandomState(4)
    q = rng.randn(12, 12)
    env = QuboEnv(q)
    spins = jnp.where(jnp.asarray(rng.rand(6, 12) < 0.5), 1.0, -1.0)
    e = np.asarray(env.obj_pm(spins))
    qs = (q + q.T) / 2
    for b in range(6):
        s = np.asarray(spins[b])
        assert abs(e[b] - s @ qs @ s) < 1e-3
    out = jax.jit(lambda s: env.sweep_pm(s, num_sweeps=2))(spins)
    assert float(env.obj_pm(out).mean()) >= float(env.obj_pm(spins).mean())
    # binary variant improves too
    bits = jnp.asarray(rng.rand(6, 12) < 0.5)
    out_b = env.sweep_bin(bits, num_sweeps=2)
    assert float(env.obj_bin(out_b).mean()) >= float(env.obj_bin(bits).mean())


def test_qubo_maxcut_equivalence():
    g = graph_from_name("BA_16_ID0")
    env = QuboEnv(maxcut_to_qubo(g.adjacency_dense()))
    from rlsolver_tpu.problems.objectives import obj_maxcut

    rng = np.random.RandomState(5)
    bits = rng.rand(4, 16) < 0.5
    spins = jnp.where(jnp.asarray(bits), 1.0, -1.0)
    e = np.asarray(env.obj_pm(spins))
    for b in range(4):
        cut = obj_maxcut(bits[b].astype(int), g)
        # cut = (W + x^T(-A)x/... ) : x^T(-A)x = 4*cut - 2W
        assert abs(e[b] - (4.0 * cut - 2.0 * g.total_weight)) < 1e-3


def test_read_qubo(tmp_path):
    q = np.arange(9, dtype=float).reshape(3, 3)
    p = tmp_path / "q.txt"
    p.write_text("\n".join(", ".join(str(x) for x in row) for row in q))
    np.testing.assert_allclose(read_qubo(str(p)), q)


# ------------------------------------------------------------------ cheeger
def test_cheeger_obj_and_sweep():
    g = graph_from_name("BA_24_ID0")
    for normalized in (False, True):
        env = CheegerEnv(g, normalized=normalized)
        bits = env.seed_bits(8)
        v0 = np.asarray(env.obj(bits))
        assert np.isfinite(v0).all()
        out = jax.jit(lambda b: env.sweep(b, num_sweeps=2))(bits)
        v1 = np.asarray(env.obj(out))
        assert (v1 <= v0 + 1e-5).all()
        # host twin for one sample
        b0 = np.asarray(out[0])
        cut = sum(
            w for (a, b), w in zip(g.edges, g.weights) if b0[a] != b0[b]
        )
        size = b0.sum()
        if normalized:
            expect = cut * (1.0 / size + 1.0 / (g.num_nodes - size))
        else:
            expect = cut / min(size, g.num_nodes - size)
        assert abs(v1[0] - expect) < 1e-4


def test_mcpg_cheeger_runs():
    g = graph_from_name("BA_24_ID0")
    env = CheegerEnv(g)
    res = solve_mcpg(
        cheeger_problem(env),
        MultiMCPGConfig(num_chains=8, repeat_times=4, num_rounds=6),
    )
    assert np.isfinite(res.best_score)
    assert 0 < res.best_bits.sum() < g.num_nodes


# --------------------------------------------------------------------- mimo
def test_mimo_detection_chain():
    inst = generate_mimo(k=4, snr_db=12.0, seed=6)
    env = MimoEnv(inst)
    ml = detect_ml_brute(inst)
    zf = detect_zf(inst)
    mmse = detect_mmse(inst)
    e = lambda x: float(env.obj(jnp.asarray(x[None]))[0])
    # ML is the best detector by definition of the residual
    assert e(ml) <= e(zf) + 1e-5 and e(ml) <= e(mmse) + 1e-5
    # sweep from random start reaches <= MMSE residual on this tiny instance
    spins = env.random_spins(jax.random.PRNGKey(7), 32)
    out = jax.jit(lambda s: env.sweep(s, num_sweeps=4))(spins)
    best = float(env.obj(out).min())
    assert best <= e(mmse) + 1e-5
    ber = np.asarray(env.bit_error_rate(out))
    assert ber.min() <= 0.3


def test_mcpg_mimo_matches_ml():
    inst = generate_mimo(k=3, snr_db=15.0, seed=8)
    env = MimoEnv(inst)
    ml_e = float(env.obj(jnp.asarray(detect_ml_brute(inst)[None]))[0])
    res = solve_mcpg(
        mimo_problem(env),
        MultiMCPGConfig(num_chains=16, repeat_times=4, num_rounds=8),
    )
    assert -res.best_score <= ml_e + 1e-4
