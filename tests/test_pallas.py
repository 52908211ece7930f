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


def _bits_twin_policy(bits_t, s):
    """XLA re-implementation of the kernel's in-kernel sampling rule."""
    import jax.numpy as jnp

    mask = jax.vmap(lambda st: st.legal)(s)
    nb = jax.vmap(lambda st: st.nb_legal)(s)
    noop = jax.vmap(lambda st: st.noop_legal)(s)
    n = nb + noop.astype(jnp.int32)
    k = (bits_t >> 1) % jnp.maximum(n, 1)
    csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    chosen = mask & (csum == (k + 1)[:, None])
    job = jnp.sum(
        jnp.where(chosen, jnp.arange(mask.shape[1])[None, :], 0), axis=1
    )
    return jnp.where(k >= nb, s.num_jobs, job.astype(jnp.int32))


def test_free_running_matches_xla_twin():
    """Free-running mode with DRIVEN random bits (no on-core PRNG, so the
    interpreter runs it): the whole fused pipeline — in-kernel sampling,
    step, auto-reset, stats — must reproduce an XLA re-implementation of the
    same sampling rule bit-for-bit on the integer stats, with zero reward-
    identity violations."""
    spec = inst.random_instance(6, 5, duration_range=(1, 9), seed=7)
    B, T = 4, 200
    state = vector.make_batch(spec, B)
    bits = np.random.default_rng(0).integers(
        0, 2**31, size=(T, B), dtype=np.int32
    )

    s = state
    stats = vector.RolloutStats.zero()
    for t in range(T):
        a = _bits_twin_policy(jnp.asarray(bits[t]), s)
        s, _, stats = vector.step_autoreset(s, a, stats)
    twin = jax.device_get(stats)

    out = pallas_rollout.rollout_free(
        state, T, tile=B, interpret=True, bits=jnp.asarray(bits)
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    assert int(out["identity_violations"]) == 0
    assert int(out["episodes"]) == int(twin.episodes) > 0
    assert int(out["total_makespan"]) == int(twin.total_makespan)
    assert int(out["min_makespan"]) == int(twin.min_makespan)
    assert int(out["steps"]) == T * B
    assert float(out["total_return"]) == pytest.approx(
        float(twin.total_return), rel=1e-5
    )


def test_free_running_int16_mode_matches(monkeypatch):
    """The opt-in int16 kernel computes identical stats (interpret mode;
    on-TPU compilation of this mode is blocked by a Mosaic bug, see
    pallas_rollout.value_dtype)."""
    monkeypatch.setenv("JSS_PALLAS_INT16", "1")
    spec = inst.random_instance(6, 5, duration_range=(1, 9), seed=7)
    B, T = 4, 120
    state = vector.make_batch(spec, B)
    assert pallas_rollout.value_dtype(state) == jnp.int16
    bits = np.random.default_rng(1).integers(
        0, 2**31, size=(T, B), dtype=np.int32
    )
    i16 = pallas_rollout.rollout_free(
        state, T, tile=B, interpret=True, bits=jnp.asarray(bits)
    )
    monkeypatch.delenv("JSS_PALLAS_INT16")
    i32 = pallas_rollout.rollout_free(
        state, T, tile=B, interpret=True, bits=jnp.asarray(bits)
    )
    for k in ("episodes", "total_makespan", "min_makespan",
              "identity_violations"):
        assert int(np.asarray(i16[k])) == int(np.asarray(i32[k])), k
    assert int(np.asarray(i32["identity_violations"])) == 0


def test_driven_parity_padded_lanes():
    """Padded job/machine rows must stay inert (engine parity under
    padding, kernel edition)."""
    spec = inst.random_instance(5, 4, duration_range=(1, 9), seed=11)
    padded = inst.stack_instances([spec], jobs_pad=8, machines_pad=6)
    state = vector.make_batch(padded, 4)
    steps = 120
    ref_state, actions, ref_raw = _xla_driven(state, steps, jax.random.key(2))
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


def test_driven_parity_ragged_mixed_instances():
    """Two different instances in one batch: lanes are regrouped
    instance-major per tile under the hood and results mapped back to the
    caller's interleaved lane order."""
    specs = [
        inst.random_instance(6, 5, duration_range=(1, 9), seed=3),
        inst.random_instance(5, 4, duration_range=(1, 9), seed=4),
    ]
    state = vector.make_batch(inst.stack_instances(specs), 8)  # interleaved
    steps = 100
    ref_state, actions, ref_raw = _xla_driven(state, steps, jax.random.key(5))
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


def test_free_running_ragged_matches_twin():
    """Free mode over a mixed-instance batch with driven bits: global stats
    equal the XLA twin's."""
    specs = [
        inst.random_instance(6, 5, duration_range=(1, 9), seed=3),
        inst.random_instance(5, 4, duration_range=(1, 9), seed=4),
    ]
    B, T = 8, 150
    state = vector.make_batch(inst.stack_instances(specs), B)
    bits = np.random.default_rng(2).integers(
        0, 2**31, size=(T, B), dtype=np.int32
    )
    s = state
    stats = vector.RolloutStats.zero()
    for t in range(T):
        a = _bits_twin_policy(jnp.asarray(bits[t]), s)
        s, _, stats = vector.step_autoreset(s, a, stats)
    twin = jax.device_get(stats)
    out = pallas_rollout.rollout_free(
        state, T, tile=4, interpret=True, bits=jnp.asarray(bits)
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    assert int(out["identity_violations"]) == 0
    assert int(out["episodes"]) == int(twin.episodes) > 0
    assert int(out["total_makespan"]) == int(twin.total_makespan)
    assert int(out["min_makespan"]) == int(twin.min_makespan)


def test_rejects_untileable_batches():
    specs = [inst.get_instance("ta01"), inst.get_instance("ta41")]
    state = vector.make_batch(inst.stack_instances(specs), 4)
    with pytest.raises(ValueError):
        # 2 lanes per instance cannot fill a 4-lane tile
        pallas_rollout.rollout_driven(
            state, jnp.zeros((4, 4), jnp.int32), 4, tile=4, interpret=True
        )


def test_pick_tile_vmem_aware():
    """Default tile sizing respects the ~16MB VMEM budget across instance
    geometries: the hand-tuned 1024 for the 15x15/30x20 families, smaller
    tiles once the (J, M, TILE) solution block grows (100x20 ta71-ta80 —
    verified compiling + running + driven-parity-exact on a v5e chip,
    docs/BENCHMARKS.md)."""
    cases = {(15, 15): 1024, (30, 20): 1024, (100, 20): 256, (50, 15): 512}
    for (J, M), want in cases.items():
        got = pallas_rollout._pick_tile(16384, None, jnp.int32, None, J, M)
        assert got == want, f"J={J} M={M}: {got} != {want}"
    # explicit tile still honored, divisibility still enforced
    assert pallas_rollout._pick_tile(512, 128, jnp.int32, None, 100, 20) == 128
    with pytest.raises(ValueError):
        pallas_rollout._pick_tile(100, 64, jnp.int32, None, 15, 15)
