"""Dispatching-rule tests: registry API, legality, and differential parity of
every rule's full greedy trajectory against the reference implementation.
"""

import jax
import numpy as np
import pytest

from jssenv_tpu import instances as inst
from jssenv_tpu.core import engine
from jssenv_tpu.rules import dispatching as dsp

from _reference_oracle import load_reference_env_class, reference_instance_path


def test_registry_complete():
    assert set(dsp.DISPATCHING_RULES) == {"SPT", "FIFO", "MWR", "LWR", "MOR", "LOR", "CR"}
    for name, rule in dsp.DISPATCHING_RULES.items():
        assert rule.get_name() == name
        assert isinstance(rule.get_description(), str) and rule.get_description()


def test_get_rule_error():
    with pytest.raises(ValueError):
        dsp.get_rule("NOT_A_RULE")


@pytest.mark.parametrize("name", sorted(dsp.DISPATCHING_RULES))
def test_rule_returns_legal_action(name):
    rule = dsp.get_rule(name)
    state = engine.state_from_spec(inst.get_instance("ta01"))
    a = int(rule.action(state))
    mask = np.asarray(state.action_mask())
    assert 0 <= a <= int(state.num_jobs)
    assert mask[a], "rule must pick a legal action"


@pytest.mark.parametrize("name", sorted(dsp.DISPATCHING_RULES))
def test_rule_episode_completes(name):
    """Greedy (no exploration) rule rollout reaches a full schedule."""
    rule = dsp.get_rule(name)
    spec = inst.get_instance("ta01")
    state = engine.state_from_spec(spec)
    step = jax.jit(engine.step)
    act = jax.jit(lambda s: rule.action(s))
    steps = 0
    while not bool(state.done):
        state, _ = step(state, act(state))
        steps += 1
        assert steps < 5000
    assert int(state.time) >= 1231  # cannot beat the published optimum
    nj, nm = spec.num_jobs, spec.num_machines
    assert (np.asarray(state.solution)[:nj, :nm] >= 0).all()


def test_batched_compare_rules():
    res = dsp.compare_rules_batched(inst.get_instance("ta01"), num_episodes=2)
    assert set(res) == set(dsp.DISPATCHING_RULES)
    for name, r in res.items():
        assert r["avg_makespan"] >= 1231, name
        assert np.isfinite(r["avg_reward"]), name


def test_batched_compare_rules_over_instance_suite():
    """BASELINE config #3: compare_rules over ta01-ta10, batched on device —
    the 10 instances tile the episode lanes under one jit shape."""
    iset = inst.get_instance_set([f"ta{i:02d}" for i in range(1, 11)])
    res = dsp.compare_rules_batched(
        iset, rules=["SPT", "MOR"], num_episodes=10, explore_prob=0.0
    )
    # ta01-ta10 optima are all >= 1200ish; any valid schedule is >= optimum
    for name, r in res.items():
        assert r["avg_makespan"] >= 1200, name


# ---------------------------------------------------------------------------
# differential parity vs the reference rules (exploration coin disabled)
# ---------------------------------------------------------------------------

RefEnv = load_reference_env_class()


@pytest.mark.skipif(RefEnv is None, reason="reference checkout not available")
@pytest.mark.parametrize("name", sorted(dsp.DISPATCHING_RULES))
def test_rule_trajectory_parity(name, monkeypatch):
    """With the 10% no-op coin disabled, each rule must pick the identical
    action at every step of its greedy trajectory and land on the identical
    makespan as the reference implementation."""
    import sys

    ref_dsp = __import__("JSSEnv.dispatching", fromlist=["dispatching"])
    # disable the exploratory no-op coin in the reference (np.random < 0.1)
    monkeypatch.setattr(ref_dsp.np.random, "random", lambda: 1.0)
    ref_rule = ref_dsp.get_rule(name)
    if name == "CR":
        ref_rule._due_dates = {}  # neutralize the cross-env cache (SURVEY §2.3.8)

    ref = RefEnv({"instance_path": reference_instance_path("ta01")})
    ref.reset()
    spec = inst.get_instance("ta01")
    state = engine.state_from_spec(spec)
    step = jax.jit(engine.step)
    rule = dsp.get_rule(name)
    act = jax.jit(lambda s: rule.action(s))

    i = 0
    done = False
    while not done:
        a_ref = int(ref_rule(ref))
        a_new = int(act(state))
        a_new_ref_convention = ref.jobs if a_new == int(state.num_jobs) else a_new
        assert a_ref == a_new_ref_convention, f"{name} step {i}: action mismatch"
        _, _, done, _, _ = ref.step(a_ref)
        state, tr = step(state, a_new)
        assert done == bool(tr.done)
        i += 1
        assert i < 5000
    assert ref.current_time_step == int(state.time), f"{name}: makespan mismatch"
