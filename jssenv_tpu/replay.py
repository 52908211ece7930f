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

from typing import Sequence, Tuple, Union

import jax
import numpy as np

from jssenv_tpu.core import engine
from jssenv_tpu.core.state import EnvState
from jssenv_tpu.instances import InstanceSpec


def replay_machine_order(
    source: Union[EnvState, InstanceSpec],
    machine_order: Sequence[Sequence[int]],
    strict: bool = True,
) -> Tuple[int, EnvState]:
    """Replay a per-machine job-order schedule; returns (makespan, final state).

    Args:
      source: a fresh EnvState or an InstanceSpec to build one from.
      machine_order: ``machine_order[m]`` lists the jobs machine ``m`` processes
        in order (one entry per job for a full schedule).
      strict: if True, raise if the replay deadlocks (order infeasible).
    """
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
