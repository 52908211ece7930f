"""Gym-compatible single-env wrapper around the functional core.

Presents the exact public surface of the reference env (reference:
JSSEnv/envs/jss_env.py class JssEnv) — same constructor config, same
old-gym-style ``reset()`` returning only the observation dict, same 5-tuple
``step``, same ~25 public attributes that dispatching rules and downstream
tests read (jobs, machines, instance_matrix, legal_actions,
todo_time_step_job, next_time_step, …) — while all simulation happens in the
jitted ``core.engine`` on whatever JAX backend is active.

Host state mirroring is lazy: one ``device_get`` per step refreshes a cached
snapshot that all attribute properties slice (unpadded) out of. The reference's
sorted event-queue list is reconstructed from the busy-machine timers
(SURVEY.md §2.3.2), byte-identical to the original including deduplication.
"""

from __future__ import annotations

import datetime
import random
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:
    import gymnasium as gym

    _BASE = gym.Env
except ImportError:  # pragma: no cover - gymnasium is an optional dep
    gym = None
    _BASE = object

from jssenv_tpu import instances as inst
from jssenv_tpu.core import engine


class KeySequence:
    """Injectable, seedable PRNG stream for rule exploration coins."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.key(seed)

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub


_jit_step = jax.jit(engine.step)
_jit_advance = jax.jit(engine.advance_time)


class JssEnv(_BASE):
    """Job Shop Scheduling environment (reference-compatible API).

    Config keys (``env_config``):
      instance_path: bundled instance name (e.g. ``"ta01"``) or a filesystem
                     path in Taillard format. Default: bundled ``ta80``
                     (reference default, jss_env.py:35-38).
      rule_seed:     optional int; enables the 10% exploratory no-op coin for
                     dispatching rules, deterministically (the reference uses
                     an unseeded global ``np.random`` instead).
      engine:        "auto" (default) | "native" | "jax". The native C++
                     engine serves single-env stepping at host speed; the JAX
                     engine is the batched/TPU path. "auto" uses native when
                     the shared library builds/loads, else JAX. Both are
                     bit-identical (tests/test_native.py).
    """

    metadata = {"render_modes": ["human"]}

    def __init__(self, env_config: Optional[Dict[str, Any]] = None):
        if env_config is None:
            env_config = {"instance_path": "ta80"}
        self.instance_path = env_config.get("instance_path", "ta80")
        self._spec = inst.get_instance(self.instance_path)

        self.jobs = self._spec.num_jobs
        self.machines = self._spec.num_machines
        # reference exposes instance_matrix with dtype (int, 2): [..., 0] is
        # the machine id, [..., 1] the duration (jss_env.py:78-85)
        self.instance_matrix = np.stack(
            [self._spec.op_machine, self._spec.op_dur], axis=-1
        ).astype(np.int64)
        self.jobs_length = self._spec.jobs_length.astype(np.int64)
        self.max_time_op = self._spec.max_time_op
        self.max_time_jobs = self._spec.max_time_jobs
        self.sum_op = self._spec.sum_op

        self.start_timestamp = datetime.datetime.now().timestamp()
        self.colors = [
            tuple(random.random() for _ in range(3)) for _ in range(self.machines)
        ]
        seed = env_config.get("rule_seed")
        self.rule_rng = KeySequence(seed) if seed is not None else None

        engine_kind = env_config.get("engine", "auto")
        if engine_kind not in ("auto", "native", "jax"):
            raise ValueError(f"unknown engine {engine_kind!r}")
        self._native = None
        if engine_kind in ("auto", "native"):
            try:
                from jssenv_tpu.native import NativeEngine

                self._native = NativeEngine(self._spec.op_machine, self._spec.op_dur)
            except (RuntimeError, OSError):
                if engine_kind == "native":
                    raise

        if gym is not None:
            self.action_space = gym.spaces.Discrete(self.jobs + 1)
            self.observation_space = gym.spaces.Dict(
                {
                    "action_mask": gym.spaces.Box(0, 1, shape=(self.jobs + 1,)),
                    "real_obs": gym.spaces.Box(
                        low=0.0, high=1.0, shape=(self.jobs, 7), dtype=float
                    ),
                }
            )

        self._engine_state = (
            None if self._native is not None else engine.state_from_spec(self._spec)
        )
        self._host = None
        self.last_time_step = float("inf")
        self.last_solution = None

    @property
    def engine_state(self):
        """The functional EnvState (jax pytree). In native mode it is
        materialized on demand from the native buffers (for checkpointing or
        moving a single env onto device)."""
        if self._native is not None:
            return self._native_to_envstate()
        return self._engine_state

    @engine_state.setter
    def engine_state(self, value):
        if self._native is not None:
            raise AttributeError("cannot set engine_state on a native-engine env")
        self._engine_state = value

    def _native_to_envstate(self):
        n = self._native
        base = engine.state_from_spec(self._spec)
        import jax.numpy as jnp

        return base.replace(
            time=jnp.int32(n.time),
            legal=jnp.asarray(n.legal.astype(bool)),
            noop_legal=jnp.bool_(n.noop_legal),
            nb_legal=jnp.int32(n.nb_legal),
            nb_machine_legal=jnp.int32(n.nb_machine_legal),
            machine_legal=jnp.asarray(n.machine_legal.astype(bool)),
            solution=jnp.asarray(n.solution),
            machine_busy_for=jnp.asarray(n.machine_busy_for),
            job_busy_for=jnp.asarray(n.job_busy_for),
            next_op=jnp.asarray(n.next_op),
            work_done=jnp.asarray(n.work_done),
            needed_machine=jnp.asarray(n.needed_machine),
            # invert the lazy idle accounting (EnvState.idle_since_op docs):
            # waiting jobs satisfy since == time - op_end_at and
            # total == idle_total_alloc + since; running/finished jobs read the
            # frozen values directly (their op_end_at is dead until overwritten
            # at the next completion, so time - since is a safe stand-in).
            op_end_at=jnp.asarray(
                (np.int32(n.time) - n.idle_since_op).astype(np.int32)
            ),
            idle_frozen=jnp.asarray(n.idle_since_op),
            idle_total_alloc=jnp.asarray(
                np.where(
                    (n.job_busy_for > 0) | (n.next_op >= self._spec.num_machines),
                    n.idle_total,
                    n.idle_total - n.idle_since_op,
                ).astype(np.int32)
            ),
            noop_pin=jnp.asarray(n.noop_pin.astype(bool)),
            # the native engine stores the normalized float obs; EnvState keeps
            # only the integer behind column 4 (wait-until-machine-free at last
            # op completion) and derives the rest. The round-trip is exact:
            # wait4 < max_time_op << 2^23.
            wait4=jnp.asarray(
                np.rint(n.obs[:, 4] * self._spec.max_time_op).astype(np.int32)
            ),
        )

    # ------------------------------------------------------------------
    # host snapshot plumbing — the native engine exposes the same attribute
    # names as EnvState, so one snapshot object serves both backends
    # ------------------------------------------------------------------
    @property
    def uses_native_engine(self) -> bool:
        return self._native is not None

    def _snapshot(self):
        if self._native is not None:
            return self._native
        if self._host is None:
            self._host = jax.device_get(self.engine_state)
        return self._host

    def _invalidate(self):
        self._host = None

    # --- dynamic attributes (reference names) ---
    @property
    def current_time_step(self) -> int:
        return int(self._snapshot().time)

    @property
    def legal_actions(self) -> np.ndarray:
        s = self._snapshot()
        return np.concatenate(
            [np.asarray(s.legal)[: self.jobs].astype(bool), [bool(s.noop_legal)]]
        )

    @property
    def nb_legal_actions(self) -> int:
        return int(self._snapshot().nb_legal)

    @property
    def nb_machine_legal(self) -> int:
        return int(self._snapshot().nb_machine_legal)

    @property
    def machine_legal(self) -> np.ndarray:
        return np.asarray(self._snapshot().machine_legal)[: self.machines].astype(bool)

    @property
    def needed_machine_jobs(self) -> np.ndarray:
        return np.asarray(self._snapshot().needed_machine)[: self.jobs]

    @property
    def todo_time_step_job(self) -> np.ndarray:
        return np.asarray(self._snapshot().next_op)[: self.jobs]

    @property
    def time_until_available_machine(self) -> np.ndarray:
        return np.asarray(self._snapshot().machine_busy_for)[: self.machines]

    @property
    def time_until_finish_current_op_jobs(self) -> np.ndarray:
        return np.asarray(self._snapshot().job_busy_for)[: self.jobs]

    @property
    def total_perform_op_time_jobs(self) -> np.ndarray:
        return np.asarray(self._snapshot().work_done)[: self.jobs]

    @property
    def total_idle_time_jobs(self) -> np.ndarray:
        return np.asarray(self._snapshot().idle_total)[: self.jobs]

    @property
    def idle_time_jobs_last_op(self) -> np.ndarray:
        return np.asarray(self._snapshot().idle_since_op)[: self.jobs]

    @property
    def illegal_actions(self) -> np.ndarray:
        return np.asarray(self._snapshot().pin)[: self.machines, : self.jobs].astype(
            bool
        )

    @property
    def action_illegal_no_op(self) -> np.ndarray:
        return np.asarray(self._snapshot().noop_pin)[: self.jobs].astype(bool)

    @property
    def solution(self) -> np.ndarray:
        return np.asarray(self._snapshot().solution)[: self.jobs, : self.machines]

    @property
    def state(self) -> np.ndarray:
        """The normalized real_obs matrix (col 0 assembled lazily, as in the
        reference's _get_current_state_representation)."""
        s = self._snapshot()
        obs = np.array(np.asarray(s.obs)[: self.jobs], dtype=float)
        obs[:, 0] = np.asarray(s.legal)[: self.jobs].astype(bool).astype(float)
        return obs

    @property
    def next_time_step(self) -> list:
        """Sorted deduplicated future completion events, reconstructed from the
        busy-machine timers (identical to the reference's queue contents)."""
        s = self._snapshot()
        busy = np.asarray(s.machine_busy_for)[: self.machines]
        t = int(s.time)
        return sorted({t + int(x) for x in busy[busy > 0]})

    # ------------------------------------------------------------------
    # env API
    # ------------------------------------------------------------------
    def _observation(self) -> Dict[str, np.ndarray]:
        return {"real_obs": self.state, "action_mask": self.legal_actions}

    def get_legal_actions(self) -> np.ndarray:
        return self.legal_actions

    def reset(self, seed=None, options=None) -> Dict[str, np.ndarray]:
        """Old-gym-style reset: returns the observation dict only (reference
        parity, SURVEY.md §2.3.1). ``seed``/``options`` are accepted so
        gymnasium's wrapper stack (gym.make's passive checker) can call this —
        the reference rejects them and therefore cannot run through gym.make on
        gymnasium >= 1.0 — but they are ignored: the env has no stochasticity
        to seed."""
        if self._native is not None:
            self._native.reset()
        else:
            self._engine_state = engine.reset(self._engine_state)
        self._invalidate()
        return self._observation()

    def step(
        self, action: int
    ) -> Tuple[Dict[str, np.ndarray], float, bool, bool, Dict]:
        if self._native is not None:
            raw, done = self._native.step(int(action))
            # scale in float32, exactly as the JAX engine does, so rewards are
            # bit-identical between the two backends
            reward = float(np.float32(raw) / np.float32(self._native.max_time_op))
        else:
            self._engine_state, tr = _jit_step(self._engine_state, int(action))
            reward = float(tr.reward)
            done = bool(tr.done)
        self._invalidate()
        if done:
            self.last_time_step = self.current_time_step
            self.last_solution = self.solution
        return self._observation(), float(reward), done, False, {}

    def increase_time_step(self) -> int:
        """Advance the clock to the next completion event; returns the machine
        idle time ("holes") accrued. Public because golden-solution drivers
        call it directly (reference tests/test_solutions.py:68)."""
        if self._native is not None:
            return self._native.advance_time()
        self._engine_state, holes = _jit_advance(self._engine_state)
        self._invalidate()
        return int(holes)

    def _is_done(self) -> bool:
        return self.nb_legal_actions == 0

    def render(self, mode: str = "human"):
        """Gantt chart of the scheduled ops so far; returns a plotly Figure if
        plotly is installed, else a matplotlib Figure; None when nothing is
        scheduled yet (reference jss_env.py:655-693 semantics)."""
        from jssenv_tpu.render import gantt

        return gantt.render_schedule(
            solution=self.solution,
            op_machine=self._spec.op_machine,
            op_dur=self._spec.op_dur,
            colors=self.colors,
            start_timestamp=self.start_timestamp,
        )
