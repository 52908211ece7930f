"""Diagnostics: profiling hooks, throughput meters, and an invariant checker.

TPU-native replacements for the reference's (absent) tracing/sanitizer
subsystems (SURVEY.md §5.1-5.2):

* ``trace`` — context manager around ``jax.profiler`` emitting a TensorBoard
  trace of the batched step for kernel-level inspection;
* ``Throughput`` — wall-clock env-steps/s meter used by the bench CLI;
* ``check_state_invariants`` — the reference test-suite's state invariants
  (obs bounds, counter coherence, pad-lane inertness; reference
  tests/test_state.py:22-76) as a host-side assertion pass over any (possibly
  batched) EnvState — the "sanitizer mode" for debugging new kernels;
* ``assert_invariants_on_device`` — the same coherence checks as a jittable
  ``checkify`` pass that can wrap the step function in debug builds.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from jssenv_tpu.core.state import EnvState


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jssenv_tpu_trace") -> Iterator[None]:
    """Profile everything inside the block into a TensorBoard trace dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Simple env-steps/s meter: meter.update(steps) after each chunk."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def update(self, n: int) -> None:
        self.steps += int(n)

    @property
    def steps_per_s(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else float("nan")


def check_state_invariants(state: EnvState) -> None:
    """Raise AssertionError if any invariant is violated. Accepts a single
    state or a batched one (leading axis)."""
    host = jax.device_get(state)
    batched = np.asarray(host.time).ndim == 1
    n = np.asarray(host.time).shape[0] if batched else 1

    def lane(x, i):
        return np.asarray(x)[i] if batched else np.asarray(x)

    for i in range(n):
        nj = int(lane(host.num_jobs, i))
        nm = int(lane(host.num_machines, i))
        obs = lane(host.obs, i)
        assert obs.min() >= -1e-9 and obs.max() <= 1.0 + 1e-9, f"lane {i}: obs bounds"
        assert np.isfinite(obs).all(), f"lane {i}: NaN/Inf in obs"
        legal = lane(host.legal, i)
        needed = lane(host.needed_machine, i)
        assert int(lane(host.nb_legal, i)) == int(legal[:nj].sum()), (
            f"lane {i}: nb_legal incoherent"
        )
        avail = set(int(m) for m in needed[:nj][legal[:nj]])
        assert len(avail) == int(lane(host.nb_machine_legal, i)), (
            f"lane {i}: nb_machine_legal incoherent"
        )
        assert not legal[nj:].any(), f"lane {i}: padded job marked legal"
        assert (lane(host.machine_busy_for, i)[nm:] == 0).all(), (
            f"lane {i}: padded machine busy"
        )
        todo = lane(host.next_op, i)
        assert (todo[:nj] <= nm).all() and (todo[:nj] >= 0).all(), (
            f"lane {i}: next_op out of range"
        )
        assert int(lane(host.time, i)) >= 0, f"lane {i}: negative clock"


def invariant_errors(state: EnvState) -> jax.Array:
    """() int32 bitmask of violated invariants, computable under jit/vmap.

    Bit 0: obs out of [0,1] or non-finite; bit 1: nb_legal incoherent;
    bit 2: nb_machine_legal incoherent; bit 3: padded lanes perturbed.
    """
    obs_ok = jnp.all(jnp.isfinite(state.obs)) & jnp.all(
        (state.obs >= -1e-9) & (state.obs <= 1.0 + 1e-9)
    )
    legal = state.legal
    nb_ok = state.nb_legal == jnp.sum(legal, dtype=jnp.int32)
    mp = state.machines_pad
    m_of = jnp.clip(state.needed_machine, 0, mp - 1)
    have = jnp.zeros((mp,), jnp.int32).at[m_of].max(legal.astype(jnp.int32)) > 0
    nbm_ok = state.nb_machine_legal == jnp.sum(have, dtype=jnp.int32)
    pad_ok = ~jnp.any(legal & ~state.job_valid)
    bits = (
        jnp.where(obs_ok, 0, 1)
        | jnp.where(nb_ok, 0, 2)
        | jnp.where(nbm_ok, 0, 4)
        | jnp.where(pad_ok, 0, 8)
    )
    return bits.astype(jnp.int32)
