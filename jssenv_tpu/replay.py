"""Schedule replay: drive the simulator with a fixed machine-order schedule.

A job-shop *solution* is fully described by, for every machine, the order in
which it processes jobs. Replaying such an order through the simulator yields
the schedule's makespan under the engine's timing semantics — the same driver
pattern the reference's golden-solution tests use (reference:
tests/test_solutions.py:41-73): repeatedly allocate the next job of any legal
machine whose turn matches the order, otherwise advance time.

This doubles as a user-facing verifier ("what makespan does this published
solution achieve?") and as the backbone of the golden parity tests.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple, Union

import jax
import numpy as np

from jssenv_tpu.core import engine
from jssenv_tpu.core.state import EnvState
from jssenv_tpu.instances import InstanceSpec


@dataclasses.dataclass
class NativeReplayState:
    """Final-state shim of the native-engine replay path: the EnvState
    attributes replay consumers read (solution/time/done/any_busy)."""

    solution: np.ndarray  # (J, M) op start times
    time: int
    done: bool
    any_busy: bool


def _replay_native(op_machine, op_dur, machine_order, strict):
    """Replay through the scalar C++ engine twin (native/jss_engine.cpp) —
    microseconds per step and zero device traffic, where the JAX path costs
    one accelerator round-trip per step (prohibitive on remote/relayed
    devices). Exact same semantics: the native engine is differentially
    tested stepwise against core.engine (tests/test_native.py)."""
    from jssenv_tpu import native

    eng = native.NativeEngine(op_machine, op_dur)
    nm = eng.machines
    idx = [0] * nm
    order = [list(machine_order[m]) for m in range(nm)]
    done = False
    while not done:
        acted = False
        for m in range(nm):
            if done:
                break
            if eng.machine_legal[m] and idx[m] < len(order[m]):
                job = order[m][idx[m]]
                if eng.needed_machine[job] == m and eng.legal[job]:
                    _, done = eng.step(job)
                    idx[m] += 1
                    acted = True
        if not acted and not done:
            if not eng.machine_busy_for.any():
                if strict:
                    raise RuntimeError(
                        "replay deadlocked: machine order is infeasible "
                        f"(progress per machine: {idx})"
                    )
                break
            prev = eng.time
            eng.advance_time()
            if eng.time <= prev:  # pragma: no cover - defensive
                raise RuntimeError("time failed to advance during replay")
    mk = int(eng.time)
    final = NativeReplayState(
        solution=eng.solution.copy(),
        time=mk,
        done=bool(done),
        any_busy=bool(eng.machine_busy_for.any()),
    )
    return mk, final


def replay_machine_order(
    source: Union[EnvState, InstanceSpec],
    machine_order: Sequence[Sequence[int]],
    strict: bool = True,
    backend: str = "jax",
) -> Tuple[int, EnvState]:
    """Replay a per-machine job-order schedule; returns (makespan, final state).

    Args:
      source: a fresh EnvState or an InstanceSpec to build one from.
      machine_order: ``machine_order[m]`` lists the jobs machine ``m`` processes
        in order (one entry per job for a full schedule).
      strict: if True, raise if the replay deadlocks (order infeasible).
      backend: "jax" (default — the path the golden parity tests certify),
        "native" (scalar C++ twin; no device traffic), or "auto" (native when
        the library loads, else jax). With "native"/"auto"-native the final
        state is a :class:`NativeReplayState` shim, not a full EnvState.
    """
    if backend not in ("jax", "native", "auto"):
        raise ValueError(f"bad replay backend {backend!r}")
    if backend in ("native", "auto"):
        if isinstance(source, InstanceSpec):
            om, od = source.op_machine, source.op_dur
            nj, nm_ = source.num_jobs, source.num_machines
        else:
            nj = int(source.num_jobs)
            nm_ = int(source.num_machines)
            om = np.asarray(source.op_machine)[:nj, :nm_]
            od = np.asarray(source.op_dur)[:nj, :nm_]
        from jssenv_tpu.native import NativeUnavailableError

        try:
            return _replay_native(om, od, machine_order, strict)
        except NativeUnavailableError:
            if backend == "native":
                raise
            # native lib unavailable — fall through to the jax path; any
            # other native RuntimeError (deadlock, time-advance failure)
            # propagates so real engine bugs are never masked (ADVICE r4)
    if isinstance(source, InstanceSpec):
        state = engine.state_from_spec(source)
    else:
        state = engine.reset(source)
    step = jax.jit(engine.step)
    advance = jax.jit(lambda s: engine.advance_time(s)[0])

    nm = int(state.num_machines)
    idx = [0] * nm
    order = [list(machine_order[m]) for m in range(nm)]
    while not bool(state.done):
        acted = False
        host = jax.device_get(state)
        machine_legal = np.asarray(host.machine_legal)
        legal = np.asarray(host.legal)
        needed = np.asarray(host.needed_machine)
        for m in range(nm):
            if bool(state.done):
                break
            if machine_legal[m] and idx[m] < len(order[m]):
                job = order[m][idx[m]]
                if needed[job] == m and legal[job]:
                    state, _ = step(state, job)
                    idx[m] += 1
                    acted = True
                    host = jax.device_get(state)
                    machine_legal = np.asarray(host.machine_legal)
                    legal = np.asarray(host.legal)
                    needed = np.asarray(host.needed_machine)
        if not acted and not bool(state.done):
            if not bool(state.any_busy):
                if strict:
                    raise RuntimeError(
                        "replay deadlocked: machine order is infeasible "
                        f"(progress per machine: {idx})"
                    )
                break
            prev = int(state.time)
            state = advance(state)
            if int(state.time) <= prev:  # pragma: no cover - defensive
                raise RuntimeError("time failed to advance during replay")
    return int(state.time), state
