"""Aux subsystem tests: checkpoint/resume, diagnostics, multihost fallbacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jssenv_tpu import checkpoint, diagnostics, instances as inst, vector
from jssenv_tpu.core import engine
from jssenv_tpu.parallel import multihost


def test_checkpoint_roundtrip_env_state(tmp_path):
    spec = inst.get_instance("ta01")
    state = engine.state_from_spec(spec)
    step = jax.jit(engine.step)
    for a in [0, 3, 7]:
        state, _ = step(state, a)
    p = str(tmp_path / "state.npz")
    checkpoint.save(p, state)
    template = engine.state_from_spec(spec)
    restored = checkpoint.load(p, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # resume: both continue identically
    s1, t1 = step(state, 5)
    s2, t2 = step(restored, 5)
    assert int(t1.raw_reward) == int(t2.raw_reward)
    assert int(s1.time) == int(s2.time)


def test_checkpoint_orbax_roundtrip(tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")  # noqa: F841
    spec = inst.get_instance("ta01")
    state = engine.state_from_spec(spec)
    step = jax.jit(engine.step)
    for a in [0, 3, 7]:
        state, _ = step(state, a)
    p = str(tmp_path / "orbax_state")
    checkpoint.save_orbax(p, state)
    restored = checkpoint.load_orbax(p, engine.state_from_spec(spec))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    s1, t1 = step(state, 5)
    s2, t2 = step(restored, 5)
    assert int(t1.raw_reward) == int(t2.raw_reward)
    assert int(s1.time) == int(s2.time)


def test_checkpoint_structure_mismatch(tmp_path):
    spec = inst.get_instance("ta01")
    state = engine.state_from_spec(spec)
    p = str(tmp_path / "state.npz")
    checkpoint.save(p, state)
    with pytest.raises(ValueError):
        checkpoint.load(p, {"wrong": jnp.zeros(3)})


def test_invariant_checker_accepts_valid_states():
    spec = inst.get_instance("ta01")
    state = vector.make_batch(spec, 8)
    diagnostics.check_state_invariants(state)
    state, _ = vector.vstep(state, jnp.zeros(8, jnp.int32))
    diagnostics.check_state_invariants(state)
    assert int(jax.vmap(diagnostics.invariant_errors)(state).max()) == 0


def test_invariant_checker_flags_corruption():
    spec = inst.get_instance("ta01")
    state = engine.state_from_spec(spec)
    bad = state.replace(nb_legal=state.nb_legal + 1)
    with pytest.raises(AssertionError):
        diagnostics.check_state_invariants(bad)
    assert int(diagnostics.invariant_errors(bad)) & 2


def test_throughput_meter():
    m = diagnostics.Throughput()
    m.update(100)
    assert m.steps == 100 and m.steps_per_s > 0


def test_multihost_single_process_fallback():
    """With process_count == 1 the multihost path equals the local path."""
    multihost.initialize()  # no-op single host
    mesh = multihost.global_mesh()
    assert mesh.devices.size == 8
    state = multihost.host_sharded_batch(inst.get_instance("ta01"), 16, mesh)
    assert state.time.shape == (16,)
    assert len(state.time.sharding.device_set) == 8
    _, stats = multihost.multihost_rollout(jax.random.key(0), state, 64)
    assert int(jax.device_get(stats).episodes) >= 0
    diagnostics.check_state_invariants(state)


def test_multihost_ragged_tiling():
    iset = inst.get_instance_set(["ta01", "ta41"])
    state = multihost.host_sharded_batch(iset, 8)
    assert list(np.asarray(state.num_jobs)) == [15, 30] * 4


def test_fault_injection_kill_and_resume(tmp_path):
    """Failure-detection/elastic-recovery (SURVEY §5.3): SIGKILL a training
    run mid-stream, restart it from its checkpoint, and require the final
    parameters to be BITWISE identical to an uninterrupted run.

    The child (tests/_fault_train_child.py) checkpoints the full TrainState
    (params, optimizer, env state, PRNG key, step counter) after every
    update; checkpoint.save is atomic (write + rename), so the kill can land
    mid-save without corrupting the resume point.
    """
    import os
    import signal
    import subprocess
    import sys

    child = os.path.join(os.path.dirname(__file__), "_fault_train_child.py")
    n_updates = 6

    def run_to_completion(ckpt):
        out = subprocess.run(
            [sys.executable, child, ckpt, str(n_updates)],
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr
        digests = [l.split()[1] for l in out.stdout.splitlines() if l.startswith("digest ")]
        return digests[-1] if digests else None

    # reference: uninterrupted run
    ref_digest = run_to_completion(str(tmp_path / "ref.npz"))
    assert ref_digest

    # faulted run: SIGKILL after the 2nd update's checkpoint lands. The child
    # runs in ack mode (JSS_FAULT_ACK=1): it blocks on stdin after every
    # "upd" print, so the kill deterministically lands while it is alive
    # (ADVICE r4: without the handshake a fast child could exit before the
    # parent drains the pipe, making returncode 0 a spurious failure).
    ckpt = str(tmp_path / "faulted.npz")
    proc = subprocess.Popen(
        [sys.executable, child, ckpt, str(n_updates)],
        stdout=subprocess.PIPE, stdin=subprocess.PIPE, text=True,
        env={**os.environ, "JSS_FAULT_ACK": "1"},
    )
    seen = 0
    for line in proc.stdout:
        if line.startswith("upd "):
            seen = int(line.split()[1])
            if seen >= 2:
                proc.kill()  # SIGKILL: no cleanup, no atexit
                break
            proc.stdin.write("go\n")
            proc.stdin.flush()
    proc.wait(timeout=60)
    assert proc.returncode != 0 and 2 <= seen < n_updates

    # resume: same command picks the checkpoint up and finishes
    resumed_digest = run_to_completion(ckpt)
    assert resumed_digest == ref_digest
