"""Stepwise differential parity vs the reference implementation (when mounted).

Drives the reference env and the new jitted core with identical random action
sequences and asserts bit-exact equality of every state field, the observation,
the raw integer reward, the done flag and the reconstructed event queue after
every single step (SURVEY.md §4 "differential harness").
"""

import jax
import numpy as np
import pytest

from jssenv_tpu import instances as inst
from jssenv_tpu.core import engine

from _reference_oracle import load_reference_env_class, reference_instance_path

RefEnv = load_reference_env_class()

pytestmark = pytest.mark.skipif(
    RefEnv is None, reason="reference checkout not available"
)


def assert_state_parity(ref, state, ctx):
    nj, nm = ref.jobs, ref.machines
    s = jax.device_get(state)
    assert ref.current_time_step == int(s.time), ctx
    assert ref.nb_legal_actions == int(s.nb_legal), ctx
    assert ref.nb_machine_legal == int(s.nb_machine_legal), ctx
    pairs = {
        "legal": (ref.legal_actions[:nj], np.asarray(s.legal)[:nj]),
        "noop": (ref.legal_actions[nj], bool(s.noop_legal)),
        "machine_legal": (ref.machine_legal, np.asarray(s.machine_legal)[:nm]),
        "solution": (ref.solution, np.asarray(s.solution)[:nj, :nm]),
        "tua": (ref.time_until_available_machine, np.asarray(s.machine_busy_for)[:nm]),
        "tuf": (ref.time_until_finish_current_op_jobs, np.asarray(s.job_busy_for)[:nj]),
        "todo": (ref.todo_time_step_job, np.asarray(s.next_op)[:nj]),
        "perf": (ref.total_perform_op_time_jobs, np.asarray(s.work_done)[:nj]),
        "needed": (ref.needed_machine_jobs, np.asarray(s.needed_machine)[:nj]),
        "idle_total": (ref.total_idle_time_jobs, np.asarray(s.idle_total)[:nj]),
        "idle_since": (ref.idle_time_jobs_last_op, np.asarray(s.idle_since_op)[:nj]),
        "pin": (ref.illegal_actions, np.asarray(s.pin)[:nm, :nj]),
        "noop_pin": (ref.action_illegal_no_op, np.asarray(s.noop_pin)[:nj]),
    }
    for key, (a, b) in pairs.items():
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"{ctx}: {key}"
    ref_obs = np.asarray(
        ref._get_current_state_representation()["real_obs"], dtype=np.float64
    )
    new_obs = np.asarray(
        jax.device_get(state.observation()["real_obs"]), dtype=np.float64
    )[:nj]
    assert np.allclose(ref_obs, new_obs, atol=1e-6), f"{ctx}: obs"
    # event queue reconstruction (SURVEY.md §2.3.2)
    busy = np.asarray(s.machine_busy_for)[:nm]
    queue = sorted(set(int(s.time) + int(t) for t in busy[busy > 0]))
    assert list(ref.next_time_step) == queue, f"{ctx}: queue"


def run_parity_episode(name, seed, jobs_pad=0, machines_pad=0, max_steps=100_000):
    spec = inst.get_instance(name)
    ref = RefEnv({"instance_path": reference_instance_path(name)})
    ref.reset()
    state = engine.state_from_spec(spec, jobs_pad=jobs_pad, machines_pad=machines_pad)
    step = jax.jit(engine.step)
    assert_state_parity(ref, state, f"{name}: reset")
    rng = np.random.default_rng(seed)
    done = False
    i = 0
    while not done and i < max_steps:
        mask = np.asarray(ref.legal_actions, dtype=np.float64)
        a = int(rng.choice(len(mask), p=mask / mask.sum()))
        a_new = int(state.num_jobs) if a == ref.jobs else a
        _, r_ref, done, _, _ = ref.step(a)
        state, tr = step(state, a_new)
        assert round(r_ref * ref.max_time_op) == int(tr.raw_reward), f"{name} step {i}: reward"
        # scaled reward: the engine divides the same two integers in float32;
        # correctly-rounded division makes it equal the reference's float64
        # value rounded to float32 (documented in docs/MIGRATION.md)
        assert np.float32(r_ref) == np.float32(tr.reward), f"{name} step {i}: scaled reward"
        assert done == bool(tr.done), f"{name} step {i}: done"
        assert_state_parity(ref, state, f"{name} step {i}")
        i += 1
    assert done


@pytest.mark.parametrize("name,seed", [("ta01", 0), ("ta01", 1), ("ta02", 2)])
def test_parity_random_episode(name, seed):
    run_parity_episode(name, seed)


def test_parity_under_padding():
    """Extra padded job/machine lanes must not perturb any real lane."""
    run_parity_episode("ta01", seed=3, jobs_pad=32, machines_pad=24)


@pytest.mark.slow
def test_parity_larger_instance():
    run_parity_episode("ta41", seed=4)


def test_parity_direct_time_advance():
    """Parity when the driver calls increase_time_step directly (golden-test
    driver pattern, reference tests/test_solutions.py:63-68)."""
    name = "ta01"
    spec = inst.get_instance(name)
    ref = RefEnv({"instance_path": reference_instance_path(name)})
    ref.reset()
    state = engine.state_from_spec(spec)
    step = jax.jit(engine.step)
    advance = jax.jit(lambda s: engine.advance_time(s)[0])
    rng = np.random.default_rng(9)
    for i in range(600):
        if ref.nb_legal_actions == 0:
            break
        legal_jobs = np.flatnonzero(np.asarray(ref.legal_actions[:-1]))
        # alternate between stepping a legal job and a bare time advance
        if i % 3 == 2 and len(ref.next_time_step) > 0:
            ref.increase_time_step()
            state = advance(state)
        else:
            a = int(rng.choice(legal_jobs))
            ref.step(a)
            state, _ = step(state, a)
        assert_state_parity(ref, state, f"mixed step {i}")
