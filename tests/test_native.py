"""Native C++ engine tests: stepwise parity vs the JAX engine (and the
reference when mounted), golden replay, and wrapper integration."""

import json
import os

import jax
import numpy as np
import pytest

from jssenv_tpu import instances as inst
from jssenv_tpu.core import engine
from jssenv_tpu.envs.gym_env import JssEnv

from _reference_oracle import load_reference_env_class, reference_instance_path

native = pytest.importorskip("jssenv_tpu.native")
if native.load() is None:
    pytest.skip("native engine unavailable (no compiler)", allow_module_level=True)

_DATA = os.path.join(os.path.dirname(__file__), "data", "golden_solutions.json")


def assert_native_matches_jax(ne, state, ctx):
    s = jax.device_get(state)
    assert ne.time == int(s.time), ctx
    assert ne.nb_legal == int(s.nb_legal), ctx
    assert ne.nb_machine_legal == int(s.nb_machine_legal), ctx
    assert ne.noop_legal == bool(s.noop_legal), ctx
    pairs = {
        "legal": (ne.legal.astype(bool), s.legal),
        "machine_legal": (ne.machine_legal.astype(bool), s.machine_legal),
        "mbf": (ne.machine_busy_for, s.machine_busy_for),
        "jbf": (ne.job_busy_for, s.job_busy_for),
        "next_op": (ne.next_op, s.next_op),
        "work_done": (ne.work_done, s.work_done),
        "needed": (ne.needed_machine, s.needed_machine),
        "idle_total": (ne.idle_total, s.idle_total),
        "idle_since": (ne.idle_since_op, s.idle_since_op),
        "pin": (ne.pin.astype(bool), s.pin),
        "noop_pin": (ne.noop_pin.astype(bool), s.noop_pin),
        "solution": (ne.solution, s.solution),
    }
    for key, (a, b) in pairs.items():
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"{ctx}: {key}"
    assert np.allclose(ne.obs, np.asarray(s.obs), atol=1e-6), f"{ctx}: obs"


@pytest.mark.parametrize("name,seed", [("ta01", 0), ("ta41", 1)])
def test_native_vs_jax_stepwise(name, seed):
    spec = inst.get_instance(name)
    ne = native.NativeEngine(spec.op_machine, spec.op_dur)
    state = engine.state_from_spec(spec)
    step = jax.jit(engine.step)
    rng = np.random.default_rng(seed)
    assert_native_matches_jax(ne, state, "reset")
    done = False
    i = 0
    while not done:
        mask = np.concatenate([ne.legal.astype(bool), [ne.noop_legal]])
        a = int(rng.choice(len(mask), p=mask / mask.sum()))
        action = spec.num_jobs if a == spec.num_jobs else a
        raw_n, done_n = ne.step(action)
        state, tr = step(state, action)
        assert raw_n == int(tr.raw_reward), f"step {i}: reward"
        assert done_n == bool(tr.done), f"step {i}: done"
        done = done_n
        assert_native_matches_jax(ne, state, f"step {i}")
        i += 1
        assert i < 5000


def test_native_golden_replay():
    with open(_DATA) as f:
        entry = json.load(f)["ta01"]
    spec = inst.get_instance("ta01")
    ne = native.NativeEngine(spec.op_machine, spec.op_dur)
    seq = entry["machine_order"]
    idx = [0] * spec.num_machines
    done = False
    while not done:
        acted = False
        for m in range(spec.num_machines):
            if done:
                break
            if ne.machine_legal[m] and idx[m] < spec.num_jobs:
                a = seq[m][idx[m]]
                if ne.needed_machine[a] == m and ne.legal[a]:
                    _, done = ne.step(a)
                    idx[m] += 1
                    acted = True
        if not acted and not done:
            assert ne.advance_time() >= 0
    assert ne.time == entry["optimum"]
    ne.reset()
    assert ne.time == 0 and ne.nb_legal == spec.num_jobs


RefEnv = load_reference_env_class()


@pytest.mark.skipif(RefEnv is None, reason="reference checkout not available")
def test_native_vs_reference_stepwise():
    ref = RefEnv({"instance_path": reference_instance_path("ta01")})
    ref.reset()
    spec = inst.get_instance("ta01")
    ne = native.NativeEngine(spec.op_machine, spec.op_dur)
    rng = np.random.default_rng(3)
    done = False
    i = 0
    while not done:
        mask = np.asarray(ref.legal_actions, dtype=np.float64)
        a = int(rng.choice(len(mask), p=mask / mask.sum()))
        _, r_ref, done_ref, _, _ = ref.step(a)
        raw_n, done_n = ne.step(a)
        assert round(r_ref * ref.max_time_op) == raw_n, f"step {i}"
        assert done_ref == done_n, f"step {i}"
        assert ref.current_time_step == ne.time, f"step {i}"
        assert np.array_equal(ref.legal_actions[:-1], ne.legal.astype(bool)), f"step {i}"
        assert bool(ref.legal_actions[-1]) == ne.noop_legal, f"step {i}"
        assert np.array_equal(ref.solution, ne.solution), f"step {i}"
        done = done_n
        i += 1


def test_wrapper_uses_native_by_default():
    env = JssEnv({"instance_path": "ta01"})
    assert env.uses_native_engine
    env.reset()
    obs, reward, done, _, _ = env.step(0)
    assert reward > 0 and not done
    assert obs["real_obs"].dtype == np.float64 or obs["real_obs"].dtype == np.float32
    # engine_state materializes a matching jax pytree on demand
    st = env.engine_state
    assert int(st.nb_legal) == env.nb_legal_actions
    assert int(st.time) == env.current_time_step


def test_wrapper_engine_selection():
    env_jax = JssEnv({"instance_path": "ta01", "engine": "jax"})
    assert not env_jax.uses_native_engine
    env_native = JssEnv({"instance_path": "ta01", "engine": "native"})
    assert env_native.uses_native_engine
    with pytest.raises(ValueError):
        JssEnv({"instance_path": "ta01", "engine": "cuda"})
    # both engines produce the same trajectory through the wrapper API
    rng = np.random.default_rng(5)
    env_jax.reset(), env_native.reset()
    for i in range(60):
        mask = env_jax.get_legal_actions().astype(np.float64)
        if not mask.any():
            break
        a = int(rng.choice(len(mask), p=mask / mask.sum()))
        o1, r1, d1, _, _ = env_jax.step(a)
        o2, r2, d2, _, _ = env_native.step(a)
        assert d1 == d2 and abs(r1 - r2) < 1e-5, f"step {i}"
        assert np.array_equal(o1["action_mask"], o2["action_mask"]), f"step {i}"
        assert np.allclose(o1["real_obs"], o2["real_obs"], atol=1e-6), f"step {i}"
        if d1:
            break


def test_rules_identical_between_engines():
    from jssenv_tpu.rules import dispatching as dsp

    for name in sorted(dsp.DISPATCHING_RULES):
        env_n = JssEnv({"instance_path": "ta01", "engine": "native"})
        env_j = JssEnv({"instance_path": "ta01", "engine": "jax"})
        rule = dsp.get_rule(name)
        _, ms_n = rule.run_episode(env_n)
        _, ms_j = rule.run_episode(env_j)
        assert ms_n == ms_j, name


def test_native_replay_matches_jax_replay():
    """replay_machine_order backend='native' (the certification fast path
    solve._refine uses) must reproduce the jax path exactly: same makespan,
    same start-time matrix, terminal invariants."""
    import json
    import os

    from jssenv_tpu import instances as inst, replay

    data = os.path.join(os.path.dirname(__file__), "data", "golden_solutions.json")
    with open(data) as f:
        entry = json.load(f)["ta01"]
    spec = inst.get_instance("ta01")
    mk_j, st_j = replay.replay_machine_order(spec, entry["machine_order"], backend="jax")
    mk_n, st_n = replay.replay_machine_order(spec, entry["machine_order"], backend="native")
    assert mk_j == mk_n == entry["optimum"]
    sol_j = np.asarray(st_j.solution)[: spec.num_jobs, : spec.num_machines]
    assert (sol_j == st_n.solution).all()
    assert st_n.done and not st_n.any_busy
