"""Vectorized env batch: thousands of lockstep simulators under vmap + jit.

The reference steps one Python env at ~3-8k steps/s (SURVEY.md §6). Here a
batch of B envs is a single ``EnvState`` pytree with a leading batch axis;
``step`` vmaps over it and whole rollouts run as one ``lax.scan`` on device —
no host round-trips inside the loop (BASELINE.json configs #3-#5).

Key entry points:
  * ``make_batch``      — B fresh envs from one spec or a (possibly ragged)
                          instance set, padded to one jit shape.
  * ``vstep``           — vmapped step: (state, actions) -> (state, transition).
  * ``step_autoreset``  — same, but finished lanes are reset and episode stats
                          (makespan, return) are surfaced exactly once.
  * ``random_legal_actions`` — on-device uniform sampling over the action mask.
  * ``rollout``         — T steps of policy-in-the-loop scan, fully on device.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from jssenv_tpu.core import engine
from jssenv_tpu.core.state import EnvState
from jssenv_tpu.instances import InstanceSet, InstanceSpec, stack_instances

Policy = Callable[[jax.Array, EnvState], jax.Array]  # (rng, state_batch) -> actions


def select_lanes(pred: jax.Array, on_true, on_false):
    """Per-lane select over batched pytrees: where ``pred`` (B,) is True take
    the lane from ``on_true`` else ``on_false`` (broadcast over leaf ranks)."""
    return jax.tree.map(
        lambda a, b: jnp.where(pred.reshape((-1,) + (1,) * (b.ndim - 1)), a, b),
        on_true,
        on_false,
    )


@struct.dataclass
class RolloutStats:
    """Accumulated statistics from an auto-resetting rollout window.

    ``total_return`` sums every step's scaled reward across ALL lanes during
    the window — including the partial prefixes/suffixes of episodes that
    straddle the window boundary. Use it for per-step reward averages; for
    exact per-episode returns use the identity
    ``raw return = 2*sum_op - machines*makespan`` on the recorded makespans,
    or ``episode_makespans`` which tracks whole episodes.
    """

    episodes: jax.Array  # () int32 — episodes completed in the window
    total_makespan: jax.Array  # () int32 sum of final makespans
    min_makespan: jax.Array  # () int32
    total_return: jax.Array  # () float32 sum of step rewards in the window
    steps: jax.Array  # () int32 — agent steps taken

    @classmethod
    def zero(cls) -> "RolloutStats":
        return cls(
            episodes=jnp.int32(0),
            total_makespan=jnp.int32(0),
            min_makespan=jnp.int32(np.iinfo(np.int32).max),
            total_return=jnp.float32(0.0),
            steps=jnp.int32(0),
        )


def make_batch(
    source: Union[InstanceSpec, InstanceSet],
    batch_size: int,
    jobs_pad: int = 0,
    machines_pad: int = 0,
) -> EnvState:
    """Create B fresh envs. For an InstanceSet, instances tile round-robin."""
    if isinstance(source, InstanceSpec):
        source = stack_instances(
            [source], jobs_pad=jobs_pad or None, machines_pad=machines_pad or None
        )
    n = len(source)
    idx = jnp.arange(batch_size, dtype=jnp.int32) % n
    om = jnp.asarray(source.op_machine)[idx]
    od = jnp.asarray(source.op_dur)[idx]
    nj = jnp.asarray(source.num_jobs)[idx]
    nm = jnp.asarray(source.num_machines)[idx]
    state = jax.vmap(engine.init_state)(om, od, nj, nm)
    max_job_length = int(np.asarray(source.op_dur).sum(axis=2).max())
    return engine.compact_static_tables(state, max_job_length=max_job_length)


vstep = jax.vmap(engine.step)
vreset = jax.vmap(engine.reset)


def strip_solution(state: EnvState) -> EnvState:
    """Return a "light" state whose solution matrix has zero job rows.

    The (B, J, M) start-time matrix is by far the largest field in the rollout
    carry (~60% of the bytes) and is only needed when the schedule artifact
    itself is wanted (rendering, replay, solving). Training and throughput
    rollouts that only consume observations/rewards/stats run measurably
    faster without it; ``engine.step``/``reset`` handle the zero-row shape
    statically, so both modes share one code path. Irreversible: re-make the
    batch to get the matrix back.
    """
    return state.replace(solution=state.solution[..., :0, :])


def random_legal_actions(rng: jax.Array, state: EnvState) -> jax.Array:
    """Uniform sample over each env's legal-action mask, entirely on device.

    Matches the reference's random rollout recipe (jss_env.py:709-711). The
    padded no-op mask slot (index jobs_pad) maps to action id ``num_jobs``.
    """
    mask = jax.vmap(EnvState.action_mask)(state)  # (B, J+1) bool
    # terminal lanes have an all-False mask; give them a dummy uniform so
    # categorical stays well-defined (their action is ignored by autoreset)
    safe_mask = jnp.where(mask.any(axis=1, keepdims=True), mask, True)
    logits = jnp.where(safe_mask, 0.0, -jnp.inf)
    a = jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
    jobs_pad = mask.shape[1] - 1
    return jnp.where(a == jobs_pad, state.num_jobs, a)


def step_autoreset(
    state: EnvState, actions: jax.Array, stats: RolloutStats
) -> Tuple[EnvState, engine.Transition, RolloutStats]:
    """Vmapped step + auto-reset of finished lanes + stats accumulation.

    Finished lanes contribute their makespan once; see RolloutStats for the
    exact meaning of the reward accumulator.
    """
    new_state, tr = vstep(state, actions)
    finished = tr.done
    n_done = jnp.sum(finished, dtype=jnp.int32)
    makespans = jnp.where(finished, new_state.time, 0)
    stats = RolloutStats(
        episodes=stats.episodes + n_done,
        total_makespan=stats.total_makespan + jnp.sum(makespans, dtype=jnp.int32),
        min_makespan=jnp.minimum(
            stats.min_makespan,
            jnp.min(jnp.where(finished, new_state.time, np.iinfo(np.int32).max)),
        ),
        total_return=stats.total_return + jnp.sum(tr.reward),
        steps=stats.steps + jnp.int32(actions.shape[0]),
    )
    # select only the DYNAMIC fields between fresh and stepped state: the
    # static instance tables are identical on both sides, and selecting them
    # would round-trip every (B, J, M) table through HBM each step
    fresh = vreset(new_state)
    picked = select_lanes(finished, fresh.dynamic_fields(), new_state.dynamic_fields())
    reset_state = new_state.replace(**picked)
    return reset_state, tr, stats


@functools.partial(jax.jit, static_argnames=("num_steps", "policy"))
def rollout(
    rng: jax.Array,
    state: EnvState,
    num_steps: int,
    policy: Policy = random_legal_actions,
) -> Tuple[EnvState, RolloutStats]:
    """Run ``num_steps`` policy steps with auto-reset, fully on device."""

    def body(carry, _):
        rng, state, stats = carry
        rng, sub = jax.random.split(rng)
        actions = policy(sub, state)
        state, _, stats = step_autoreset(state, actions, stats)
        return (rng, state, stats), None

    (rng, state, stats), _ = jax.lax.scan(
        body, (rng, state, RolloutStats.zero()), None, length=num_steps
    )
    return state, stats


@functools.partial(jax.jit, static_argnames=("max_steps", "policy"))
def episode_makespans(
    rng: jax.Array,
    state: EnvState,
    max_steps: int,
    policy: Policy = random_legal_actions,
) -> Tuple[EnvState, jax.Array, jax.Array]:
    """Run every lane to its FIRST episode end (no reset); returns
    (final_state, makespans (B,), returns (B,)). Lanes that finish early are
    frozen; the loop exits as soon as ALL lanes are done (or at ``max_steps``),
    so short-episode batches don't pay for the worst case."""

    def cond(carry):
        step_i, _, _, done_seen, _, _ = carry
        return (step_i < max_steps) & ~jnp.all(done_seen)

    def body(carry):
        step_i, rng, state, done_seen, ms, ret = carry
        rng, sub = jax.random.split(rng)
        actions = policy(sub, state)
        # freeze finished lanes: step everyone, keep old state on done lanes
        new_state, tr = vstep(state, actions)
        keep = done_seen  # lanes already finished before this step
        picked = select_lanes(keep, state.dynamic_fields(), new_state.dynamic_fields())
        state = new_state.replace(**picked)
        newly = ~keep & tr.done
        ms = jnp.where(newly, new_state.time, ms)
        ret = ret + jnp.where(keep, 0.0, tr.reward)
        return (step_i + 1, rng, state, keep | tr.done, ms, ret)

    B = state.time.shape[0]
    init = (
        jnp.int32(0),
        rng,
        state,
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.float32),
    )
    carry = jax.lax.while_loop(cond, body, init)
    _, rng, state, done_seen, ms, ret = carry
    return state, ms, ret
