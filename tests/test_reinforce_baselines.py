"""rl4co-parity REINFORCE baseline zoo (`rl4co/.../baselines.py:18-292`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlsolver_tpu.algos.reinforce_baselines import (
    CriticBaseline,
    ExponentialBaseline,
    ReinforceConfig,
    RolloutBaseline,
    SharedBaseline,
    WarmupBaseline,
    _t_sf,
    get_reinforce_baseline,
    train_reinforce,
)


def test_exponential_ema_math():
    bl = ExponentialBaseline(beta=0.8)
    state = bl.init(jax.random.PRNGKey(0), None, None, None)
    rewards = [jnp.full((4,), r) for r in (1.0, 2.0, 3.0)]
    vals = []
    for r in rewards:
        v, state = bl.eval(state, r, None)
        vals.append(float(v[0]))
    # first call seeds the EMA with the batch mean, then v = .8 v + .2 m
    assert vals[0] == 1.0
    assert abs(vals[1] - (0.8 * 1.0 + 0.2 * 2.0)) < 1e-6
    assert abs(vals[2] - (0.8 * vals[1] + 0.2 * 3.0)) < 1e-6


def test_shared_baseline_pomo_mean():
    bl = SharedBaseline()
    r = jnp.asarray([[1.0, 3.0], [2.0, 4.0]])
    v, _ = bl.eval(bl.init(None, None, None, None), r, None)
    np.testing.assert_allclose(np.asarray(v), [[2.0], [3.0]])
    with pytest.raises(ValueError):
        bl.eval(bl.init(None, None, None, None), jnp.ones((4,)), None)


def test_registry_and_warmup():
    assert isinstance(get_reinforce_baseline("exponential", beta=0.9),
                      ExponentialBaseline)
    assert isinstance(get_reinforce_baseline("mean"), ExponentialBaseline)
    wb = get_reinforce_baseline("warmup_shared")
    assert isinstance(wb, WarmupBaseline) and isinstance(wb.inner, SharedBaseline)
    with pytest.raises(ValueError, match="unknown baseline"):
        get_reinforce_baseline("nope")


def test_warmup_keeps_inner_state_separate():
    # The warmup's own exponential EMA must not entangle with the inner
    # baseline's (ema, steps): after rewards [1, 2] the warmup EMA is
    # 0.8*1 + 0.2*2 = 1.2 (not double-updated), its ramp counter advances
    # once per eval, and the inner exponential EMA sees exactly the same.
    wb = WarmupBaseline(ExponentialBaseline(beta=0.8), n_steps=4, beta=0.8)
    state = wb.init(jax.random.PRNGKey(0), None, None, None)
    _, state = wb.eval(state, jnp.full((4,), 1.0), None)
    _, state = wb.eval(state, jnp.full((4,), 2.0), None)
    assert abs(float(state.warmup_ema) - 1.2) < 1e-6
    assert int(state.warmup_steps) == 2
    assert abs(float(state.ema) - 1.2) < 1e-6  # inner updated once per eval
    assert int(state.steps) == 2
    # blended value at the third eval: alpha = 2/4
    v, state = wb.eval(state, jnp.full((4,), 3.0), None)
    expect = 0.8 * 1.2 + 0.2 * 3.0  # both EMAs agree here (same beta)
    np.testing.assert_allclose(np.asarray(v), expect, rtol=1e-6)


def test_t_test_survival_function():
    assert abs(_t_sf(0.0, 10) - 0.5) < 1e-6
    # one-sided p for t=3.0, df=30 is ~0.0027 (tables)
    assert abs(_t_sf(3.0, 30) - 0.0027) < 5e-4
    assert _t_sf(5.0, 30) < _t_sf(2.0, 30) < _t_sf(1.0, 30)


def test_rollout_baseline_adoption():
    class Stub(RolloutBaseline):
        def __init__(self, cand_mean):
            self.bl_alpha = 0.05
            self.eval_nodes = jnp.zeros((64, 4, 2))
            self.cand_mean = cand_mean

        def _greedy_rewards(self, params, nodes, pomo=1):
            base = jnp.arange(nodes.shape[0], dtype=jnp.float32) * 0.01
            return base + (self.cand_mean if params == "cand" else 0.0)

    adopt = Stub(cand_mean=1.0)
    state = adopt.init(jax.random.PRNGKey(0), None, "base", None)
    new = adopt.epoch_update(state, None, "cand", jax.random.PRNGKey(1))
    assert new.frozen_params == "cand"  # big improvement: adopted

    keep = Stub(cand_mean=0.0)
    state = keep.init(jax.random.PRNGKey(0), None, "base", None)
    new = keep.epoch_update(state, None, "cand", jax.random.PRNGKey(1))
    assert new.frozen_params == "base"  # no improvement: kept


def test_train_reinforce_exponential_improves():
    cfg = ReinforceConfig(num_cities=8, embed_dim=32, num_layers=1,
                          batch_size=32, num_steps=60, lr=1e-3, epoch_every=0)
    _, hist = train_reinforce(get_reinforce_baseline("exponential"), cfg)
    first = np.mean(hist["mean_length"][:10])
    last = np.mean(hist["mean_length"][-10:])
    assert last < first  # learning signal through the EMA baseline


def test_train_reinforce_critic_runs_and_fits():
    cfg = ReinforceConfig(num_cities=8, embed_dim=32, num_layers=1,
                          batch_size=32, num_steps=40, lr=1e-3, epoch_every=0)
    bl = CriticBaseline(hidden=32, lr=3e-3)
    params, hist = train_reinforce(bl, cfg)
    assert np.isfinite(hist["mean_length"]).all()


def test_s2v_maxcut_through_zoo_rollout_beats_no_baseline():
    """The constructive S2V maxcut policy trains through the generic
    REINFORCE trainer (VERDICT r2 item 6; ref `ECO_S2V/rl4co/models/zoo/
    S2V/`): on BA_64, rollout-baseline training reaches a clearly higher
    final greedy cut than the no-baseline variant with the same budget
    (observed margin ~ +20-40 cut at every seed)."""
    from rlsolver_tpu.algos.reinforce_baselines import (
        NoBaseline,
        S2VMaxcutAdapter,
    )

    def final_greedy(baseline_name):
        cfg = ReinforceConfig(
            embed_dim=32, num_layers=2, batch_size=64, num_steps=60,
            epoch_every=15, lr=1e-2, seed=0,
        )
        adapter = S2VMaxcutAdapter(cfg, num_nodes=64, pool_size=16)
        eval_adj = adapter._pool()
        if baseline_name == "rollout":
            bl = RolloutBaseline(adapter, eval_adj, bl_alpha=0.25)
        else:
            bl = NoBaseline()
        params, hist = train_reinforce(bl, cfg, adapter=adapter)
        _, _, rewards = adapter.rollout(
            params, jax.random.PRNGKey(99), eval_adj, greedy=True
        )
        return float(np.mean(np.asarray(rewards))), hist

    r_roll, hist_roll = final_greedy("rollout")
    r_none, _ = final_greedy("no")
    assert hist_roll["mean_reward"][-1] > hist_roll["mean_reward"][0]
    assert r_roll > r_none + 5.0
