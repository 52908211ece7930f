"""Differential tests for the fused Pallas rollout kernel.

The kernel's step math must be stepwise-identical to the XLA engine
(core/engine.py), which is itself parity-tested against the reference
(tests/test_parity.py) — so agreement here transitively proves reference
parity. The kernel runs on the Pallas interpreter (CPU) with the exact same
semantics the TPU build compiles.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from jssenv_tpu import instances as inst  # noqa: E402
from jssenv_tpu import vector  # noqa: E402
from jssenv_tpu.core import pallas_rollout  # noqa: E402


def _xla_driven(state, num_steps, rng):
    """XLA twin: sample random legal actions, step with auto-reset, recording
    the action stream and per-step raw rewards."""
    actions, raws = [], []
    stats = vector.RolloutStats.zero()
    for _ in range(num_steps):
        rng, sub = jax.random.split(rng)
        a = vector.random_legal_actions(sub, state)
        state, tr, stats = vector.step_autoreset(state, a, stats)
        actions.append(np.asarray(a))
        raws.append(np.asarray(tr.raw_reward))
    return state, np.stack(actions), np.stack(raws)


@pytest.mark.parametrize("name,steps", [("ta01", 96), ("ta41", 64)])
def test_driven_parity_mid_episode(name, steps):
    """Same action stream => identical raw rewards and final state, stepwise."""
    spec = inst.get_instance(name)
    state = vector.make_batch(spec, 8)
    ref_state, actions, ref_raw = _xla_driven(state, steps, jax.random.key(0))

    final, raw = pallas_rollout.rollout_driven(
        state, jnp.asarray(actions), steps, tile=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(raw), ref_raw)
    for name_, _, _ in pallas_rollout._FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(final, name_)),
            np.asarray(getattr(ref_state, name_)),
            err_msg=f"field {name_} diverged",
        )


def test_driven_parity_across_episode_boundary():
    """Long enough to finish episodes: covers done detection + auto-reset."""
    # a small random instance keeps full episodes cheap under the interpreter
    spec = inst.random_instance(6, 5, duration_range=(1, 9), seed=3)
    state = vector.make_batch(spec, 4)
    steps = 160  # several episodes per lane
    ref_state, actions, ref_raw = _xla_driven(state, steps, jax.random.key(1))

    final, raw = pallas_rollout.rollout_driven(
        state, jnp.asarray(actions), steps, tile=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(raw), ref_raw)
    for name_, _, _ in pallas_rollout._FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(final, name_)),
            np.asarray(getattr(ref_state, name_)),
            err_msg=f"field {name_} diverged",
        )
    # sanity: episodes actually completed during the window
    assert ref_raw.sum() != 0


def test_free_running_identity_and_stats():
    """In-kernel policy: every completed episode satisfies the exact reward
    identity raw_return == 2*sum_op - M*makespan; stats are consistent."""
    spec = inst.random_instance(6, 5, duration_range=(1, 9), seed=7)
    state = vector.make_batch(spec, 4)
    try:
        stats = pallas_rollout.rollout_free(
            state, 160, seed=42, tile=4, interpret=True
        )
        stats = {k: np.asarray(v) for k, v in stats.items()}
    except Exception as e:  # pragma: no cover - interpreter PRNG support gap
        pytest.skip(f"pallas PRNG unsupported in interpret mode here: {e}")
    assert stats["identity_violations"] == 0
    assert stats["episodes"] > 0
    assert stats["steps"] == 160 * 4
    lb = int(np.asarray(spec.op_dur).sum(axis=1).max())  # trivial makespan LB
    assert stats["min_makespan"] >= lb
    assert stats["total_makespan"] >= stats["episodes"] * stats["min_makespan"]


def test_rejects_ragged_batches():
    specs = [inst.get_instance("ta01"), inst.get_instance("ta41")]
    state = vector.make_batch(inst.stack_instances(specs), 4)
    with pytest.raises(ValueError):
        pallas_rollout.rollout_driven(
            state, jnp.zeros((4, 4), jnp.int32), 4, tile=4, interpret=True
        )
