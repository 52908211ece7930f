"""Property/invariant tests over random episodes (reference tests/test_state.py).

Invariants checked after every step of random full episodes:
  * observation within [0, 1], no NaN/Inf;
  * cached counter coherence: nb_legal == mask[:-1].sum() and
    nb_machine_legal == |{needed machines of legal jobs}|;
  * terminal invariants: no busy machine, solution fully filled,
    next_op == machines for all jobs.
"""

import jax
import numpy as np
import pytest

from jssenv_tpu import instances as inst
from jssenv_tpu.core import engine


def _check_invariants(state):
    host = jax.device_get(state)
    nj = int(host.num_jobs)
    obs = np.asarray(state.observation()["real_obs"])
    assert obs.max() <= 1.0 + 1e-9, "out of max bound state"
    assert obs.min() >= -1e-9, "out of min bound state"
    assert not np.isnan(obs).any()
    assert not np.isinf(obs).any()
    legal = np.asarray(host.legal)[:nj]
    needed = np.asarray(host.needed_machine)[:nj]
    assert int(host.nb_legal) == int(legal.sum())
    machines_avail = set(int(m) for m in needed[legal])
    assert len(machines_avail) == int(host.nb_machine_legal)
    # padded lanes stay inert
    assert not np.asarray(host.legal)[nj:].any()
    assert (np.asarray(host.obs)[nj:] == 0).all()


@pytest.mark.parametrize("name,episodes", [("ta01", 3), ("ta41", 1)])
def test_random_episode_invariants(name, episodes):
    spec = inst.get_instance(name)
    step = jax.jit(engine.step)
    rng = np.random.default_rng(12345)
    for _ in range(episodes):
        state = engine.state_from_spec(spec, jobs_pad=spec.num_jobs + 3)
        assert int(state.time) == 0
        _check_invariants(state)
        done = False
        steps = 0
        while not done:
            mask = np.asarray(state.action_mask(), dtype=np.float64)
            a = rng.choice(len(mask), p=mask / mask.sum())
            if a == len(mask) - 1:
                a = spec.num_jobs  # no-op action id is the real job count
            state, tr = step(state, int(a))
            done = bool(tr.done)
            steps += 1
            assert steps < 10_000, "episode failed to terminate"
            _check_invariants(state)
        host = jax.device_get(state)
        assert not bool(state.any_busy)
        nj, nm = spec.num_jobs, spec.num_machines
        assert (np.asarray(host.solution)[:nj, :nm] >= 0).all()
        assert (np.asarray(host.next_op)[:nj] == nm).all()
        # episode reward identity (SURVEY.md §2.1 #10, verified vs reference):
        # raw cumulative reward == 2*sum_op - machines*makespan


def test_reward_identity():
    spec = inst.get_instance("ta01")
    step = jax.jit(engine.step)
    rng = np.random.default_rng(7)
    state = engine.state_from_spec(spec)
    total_raw = 0
    done = False
    while not done:
        mask = np.asarray(state.action_mask(), dtype=np.float64)
        a = rng.choice(len(mask), p=mask / mask.sum())
        if a == len(mask) - 1:
            a = spec.num_jobs
        state, tr = step(state, int(a))
        total_raw += int(tr.raw_reward)
        done = bool(tr.done)
    makespan = int(state.time)
    assert total_raw == 2 * spec.sum_op - spec.num_machines * makespan


def test_rich_obs_shape_bounds_and_padding():
    """rich_obs: 13 columns (7 reference + 6 rule-aligned), bounded values,
    zeros on padded job rows, and the first 7 columns equal to obs."""
    import jax
    import jax.numpy as jnp

    from jssenv_tpu import vector

    padded = inst.stack_instances(
        [inst.get_instance("ta01")], jobs_pad=20, machines_pad=18
    )
    state = vector.make_batch(padded, 3)
    step = jax.jit(jax.vmap(engine.step))
    for a in [0, 5, 9]:
        state, _ = step(state, jnp.full((3,), a, jnp.int32))
    rich = np.asarray(jax.vmap(lambda s: s.rich_obs)(state))
    base = np.asarray(jax.vmap(lambda s: s.obs)(state))
    assert rich.shape == (3, 20, 13)
    np.testing.assert_allclose(rich[..., :7], base, atol=0)
    assert np.isfinite(rich).all()
    # normalized channels stay in sane ranges
    assert (rich[..., 7] <= 1.0 + 1e-6).all() and (rich[..., 7] >= 0).all()  # cur dur
    assert (rich[..., 9] <= 1.0 + 1e-6).all()  # remaining ops fraction
    assert (rich[..., 10] <= 1.0 + 1e-6).all()  # clipped critical ratio
    assert (rich[..., 12] <= 1.0 + 1e-6).all()  # contention fraction
    # padded job rows carry zeros everywhere
    assert (rich[:, 15:, :] == 0).all()
