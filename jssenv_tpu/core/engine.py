"""Pure-functional simulator core: reset / advance_time / step as jit-able ops.

This module is the TPU-native re-design of the reference env's imperative core
(reference: JSSEnv/envs/jss_env.py:145-653). Every reference Python loop over
jobs/machines becomes a masked tensor op; the event queue becomes a
min-reduction; the auto fast-forward collapses to a closed form; the two
mask-shaping heuristics become fixed-shape masked reductions/scans. All
functions are pure ``EnvState -> EnvState`` maps and compose with
``jax.jit``/``jax.vmap``/``shard_map``.

Bit-exactness contract (SURVEY.md §2.3): for any legal action sequence, the
state after ``step`` here equals the reference env's state field-for-field —
same clock, mask, counters, solution matrix, raw (integer) reward and
observation values. The parity tests in tests/test_parity.py verify this
stepwise against the reference implementation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from jssenv_tpu.core import ops
from jssenv_tpu.core.state import EnvState
from jssenv_tpu.instances import InstanceSpec

_I32_MAX = jnp.iinfo(jnp.int32).max


@struct.dataclass
class Transition:
    """Result of one agent step.

    reward:     () float32 — scaled reward (raw / max_time_op), reference
                _reward_scaler (jss_env.py:483-493).
    raw_reward: () int32 — exact integer reward before scaling
                (+duration on allocation, -machine idle holes on fast-forward).
    done:       () bool — nb_legal_actions == 0 (jss_env.py:639-653).
    """

    reward: jax.Array
    raw_reward: jax.Array
    done: jax.Array


# ---------------------------------------------------------------------------
# construction / reset
# ---------------------------------------------------------------------------


def init_state(
    op_machine: jax.Array,
    op_dur: jax.Array,
    num_jobs: jax.Array,
    num_machines: jax.Array,
) -> EnvState:
    """Build a freshly-reset EnvState from padded instance tensors.

    Mirrors reference ``reset()`` (jss_env.py:145-181) plus the derived
    normalizer scalars computed at construction (jss_env.py:86-89). Padded job
    lanes are initialized as already-finished; padded machines as permanently
    free and never needed, so they are inert under every kernel.
    """
    op_machine = jnp.asarray(op_machine, jnp.int32)
    op_dur = jnp.asarray(op_dur, jnp.int32)
    jp, mp = op_machine.shape
    num_jobs = jnp.asarray(num_jobs, jnp.int32)
    num_machines = jnp.asarray(num_machines, jnp.int32)
    job_valid = jnp.arange(jp, dtype=jnp.int32) < num_jobs
    jobs_length = jnp.sum(op_dur, axis=1, dtype=jnp.int32)

    # Static inverse permutation: op_pos[j, m] = position of machine m in job
    # j's op sequence (each job visits each machine exactly once — the JSSP
    # contract, enforced at parse time). Padded columns get a unique large key
    # so argsort maps real machines exactly; sentinel = mp where m is padding.
    p_idx = jnp.arange(mp, dtype=jnp.int32)
    col_pad = (p_idx[None, :] >= num_machines) | ~job_valid[:, None]
    om_eff = jnp.where(col_pad, mp + p_idx[None, :], op_machine)
    order = jnp.argsort(om_eff, axis=1).astype(jnp.int32)  # (J, M)
    m_valid_col = (p_idx[None, :] < num_machines) & job_valid[:, None]
    op_pos = jnp.where(m_valid_col, order, mp)
    # cum_before[j, m] = exclusive prefix sum of durations at op_pos[j, m]
    cum_excl = jnp.concatenate(
        [jnp.zeros((jp, 1), jnp.int32), jnp.cumsum(op_dur, axis=1)[:, :-1]],
        axis=1,
    )
    cum_before = jnp.where(
        m_valid_col,
        jnp.take_along_axis(cum_excl, jnp.clip(op_pos, 0, mp - 1), axis=1),
        0,
    )

    return _fresh_state(
        op_machine=op_machine,
        op_dur=op_dur,
        op_pos=op_pos,
        cum_before=cum_before,
        num_jobs=num_jobs,
        num_machines=num_machines,
        max_time_op=jnp.max(op_dur).astype(jnp.int32),
        max_time_jobs=jnp.max(jobs_length).astype(jnp.int32),
        sum_op=jnp.sum(op_dur, dtype=jnp.int32),
    )


def _fresh_state(
    op_machine,
    op_dur,
    op_pos,
    cum_before,
    num_jobs,
    num_machines,
    max_time_op,
    max_time_jobs,
    sum_op,
) -> EnvState:
    """Zero-initialize the dynamic state around existing static tables.

    Split out of ``init_state`` so that ``reset`` (which runs on EVERY
    auto-reset step inside rollouts) does not recompute the static
    inverse-permutation tables or normalizer scalars."""
    jp, mp = op_machine.shape
    job_valid = jnp.arange(jp, dtype=jnp.int32) < num_jobs

    state = EnvState(
        op_machine=op_machine,
        op_dur=op_dur,
        op_pos=op_pos,
        cum_before=cum_before,
        num_jobs=num_jobs,
        num_machines=num_machines,
        max_time_op=max_time_op,
        max_time_jobs=max_time_jobs,
        sum_op=sum_op,
        time=jnp.int32(0),
        legal=job_valid,
        noop_legal=jnp.bool_(False),
        nb_legal=num_jobs,
        nb_machine_legal=jnp.int32(0),
        machine_legal=jnp.zeros((mp,), jnp.bool_),
        solution=jnp.full((jp, mp), -1, jnp.int32),
        machine_busy_for=jnp.zeros((mp,), jnp.int32),
        job_busy_for=jnp.zeros((jp,), jnp.int32),
        next_op=jnp.where(job_valid, 0, num_machines).astype(jnp.int32),
        work_done=jnp.zeros((jp,), jnp.int32),
        needed_machine=jnp.where(job_valid, op_machine[:, 0], -1).astype(jnp.int32),
        op_end_at=jnp.zeros((jp,), jnp.int32),
        idle_frozen=jnp.zeros((jp,), jnp.int32),
        idle_total_alloc=jnp.zeros((jp,), jnp.int32),
        noop_pin=jnp.zeros((jp,), jnp.bool_),
        wait4=jnp.zeros((jp,), jnp.int32),
    )
    # machine_legal[m] = some valid job's first op runs on m (jss_env.py:174-179)
    ml = ops.segment_any(
        jnp.clip(state.needed_machine, 0, mp - 1), job_valid, mp
    )
    return state.replace(
        machine_legal=ml, nb_machine_legal=jnp.sum(ml, dtype=jnp.int32)
    )


def compact_static_tables(state: EnvState, max_job_length: int) -> EnvState:
    """Downcast the static instance tables to the narrowest safe dtypes.

    The batched step is HBM-bandwidth-bound and the (J, M) tables are its
    biggest loads; machine ids / op positions fit int8 when machines_pad <= 126
    (the op_pos sentinel is machines_pad itself) and durations / per-job prefix
    sums fit int16 when no job's total work exceeds int16 range. All consumers
    promote to int32 on read (ops._widen and explicit casts), so arithmetic is
    unchanged. ``max_job_length`` must be a host-side bound on
    ``max(jobs_length)`` for every instance that will ever share this state.
    """
    mp = state.machines_pad
    id_dt = jnp.int8 if mp <= 126 else jnp.int32
    val_dt = jnp.int16 if max_job_length <= 32767 else jnp.int32
    return state.replace(
        op_machine=state.op_machine.astype(id_dt),
        op_pos=state.op_pos.astype(id_dt),
        op_dur=state.op_dur.astype(val_dt),
        cum_before=state.cum_before.astype(val_dt),
    )


def reset(state: EnvState) -> EnvState:
    """Reset an existing state in place (same instance), pure.

    Reuses the static tables and normalizer scalars — no argsort/cumsum/max
    recompute, which matters because auto-resetting rollouts call this every
    step on the done lanes. Preserves a "light" state's zero-row solution
    shape (vector.strip_solution)."""
    fresh = _fresh_state(
        op_machine=state.op_machine,
        op_dur=state.op_dur,
        op_pos=state.op_pos,
        cum_before=state.cum_before,
        num_jobs=state.num_jobs,
        num_machines=state.num_machines,
        max_time_op=state.max_time_op,
        max_time_jobs=state.max_time_jobs,
        sum_op=state.sum_op,
    )
    if fresh.solution.shape != state.solution.shape:
        fresh = fresh.replace(solution=jnp.full_like(state.solution, -1))
    return fresh


def state_from_spec(spec: InstanceSpec, jobs_pad: int = 0, machines_pad: int = 0) -> EnvState:
    """Host helper: build an EnvState from a parsed InstanceSpec."""
    padded = spec.padded(max(jobs_pad, spec.num_jobs), max(machines_pad, spec.num_machines))
    state = init_state(
        jnp.asarray(padded.op_machine),
        jnp.asarray(padded.op_dur),
        spec.num_jobs,
        spec.num_machines,
    )
    return compact_static_tables(state, max_job_length=spec.max_time_jobs)


# ---------------------------------------------------------------------------
# time advance (the reference's increase_time_step, jss_env.py:495-637)
# ---------------------------------------------------------------------------


def advance_time(state: EnvState) -> Tuple[EnvState, jax.Array]:
    """Advance the clock to the next completion event; returns (state, holes).

    ``holes`` is the total machine idle time accrued during the advance — the
    reward penalty (reference hole_planning). The event popped from the
    reference's sorted queue always equals ``time + min(busy machine_busy_for)``
    (SURVEY.md §2.3.2), so no queue is materialized. Calling this when no
    machine is busy (reference would raise on ``pop``) is a safe no-op here.
    """
    jp, mp = state.jobs_pad, state.machines_pad
    busy = state.machine_busy_for > 0
    any_busy = jnp.any(busy)
    diff = jnp.where(
        any_busy,
        jnp.min(jnp.where(busy, state.machine_busy_for, _I32_MAX)),
        0,
    )
    time = state.time + diff

    # ---- per-job update (jss_env.py:525-601) ----
    was_left = state.job_busy_for
    running = was_left > 0  # padded jobs: never busy
    performed = jnp.minimum(diff, was_left)
    job_busy_for = jnp.where(running, jnp.maximum(0, was_left - diff), was_left)
    work_done = state.work_done + jnp.where(running, performed, 0)
    completed = running & (job_busy_for == 0)

    # Idle accounting is lazy (EnvState.idle_since_op / idle_total): recording
    # the completion time is the only work the advance does. A completing job's
    # remaining time always equals the popped event delta (its completion IS an
    # event, and events pop in order), so the reference's completion-time idle
    # accrual (jss_env.py:552-555) is identically 0 and ``op_end_at == time``.
    op_end_at = jnp.where(completed, time, state.op_end_at)
    next_op = state.next_op + completed.astype(jnp.int32)
    finished_now = completed & (next_op == state.num_machines)
    continues = completed & (next_op < state.num_machines)
    next_machine = ops.row_gather(state.op_machine, jnp.clip(next_op, 0, mp - 1))
    needed_machine = jnp.where(
        continues, next_machine, jnp.where(finished_now, -1, state.needed_machine)
    )
    # a job that just finished while legal becomes illegal (jss_env.py:589-591)
    drop_legal = finished_now & state.legal
    legal = state.legal & ~drop_legal
    nb_legal = state.nb_legal - jnp.sum(drop_legal, dtype=jnp.int32)

    # The reference's per-advance waiting-idle accrual (jss_env.py:594-601)
    # telescopes to ``time - op_end_at`` and is derived at read time — no
    # per-iteration work here.

    # Obs columns 1/2/3/5/6 are derived on demand from the integer state
    # (EnvState.obs property) — no float work in the advance. Only column 4 is
    # history-dependent: the "wait until the needed machine frees" of a job
    # that just completed an op, computed from the PRE-advance machine timers
    # minus diff (jss_env.py:569-578). The finished-job 1.0 sentinel
    # (jss_env.py:586) is encoded by needed_machine == -1 at read time.
    wait_next = jnp.maximum(
        0,
        ops.lookup(state.machine_busy_for, jnp.clip(needed_machine, 0, mp - 1)) - diff,
    )
    wait4 = jnp.where(continues, wait_next, state.wait4)

    # ---- per-machine update (jss_env.py:604-634) ----
    m_valid = state.machine_valid
    holes = jnp.sum(
        jnp.where(m_valid, jnp.maximum(0, diff - state.machine_busy_for), 0),
        dtype=jnp.int32,
    )
    machine_busy_for = jnp.maximum(0, state.machine_busy_for - diff)
    free = (machine_busy_for == 0) & m_valid

    # re-legalize jobs whose needed machine became free, unless no-op pinned
    # (jss_env.py:616-629); gated on any_busy so a queue-empty call is a no-op.
    # The reference's illegal_actions[m][j] pin guard equals noop_pin[j] here:
    # a pinned job is always waiting on its pin machine (EnvState.pin), and a
    # job that just completed an op was running, hence unpinned.
    nm_clip = jnp.clip(needed_machine, 0, mp - 1)
    cand = (
        any_busy
        & (needed_machine >= 0)
        & ops.lookup(free, nm_clip)
        & ~legal
        & ~state.noop_pin
        & state.job_valid
    )
    legal = legal | cand
    nb_legal = nb_legal + jnp.sum(cand, dtype=jnp.int32)
    ml_add = ops.segment_any(nm_clip, cand, mp)
    nb_machine_legal = state.nb_machine_legal + jnp.sum(
        ml_add & ~state.machine_legal, dtype=jnp.int32
    )
    machine_legal = state.machine_legal | ml_add

    new_state = state.replace(
        time=time,
        legal=legal,
        nb_legal=nb_legal,
        nb_machine_legal=nb_machine_legal,
        machine_legal=machine_legal,
        machine_busy_for=machine_busy_for,
        job_busy_for=job_busy_for,
        next_op=next_op,
        work_done=work_done,
        needed_machine=needed_machine,
        op_end_at=op_end_at,
        wait4=wait4,
    )
    return new_state, holes


def fast_forward(state: EnvState) -> Tuple[EnvState, jax.Array]:
    """Closed-form equivalent of ``while nb_machine_legal == 0 and queue:
    advance_time()`` (reference jss_env.py:469-470 / 429-430) — ONE update,
    no loop.

    Key insight: during the auto fast-forward no new allocation happens, so
    every machine's free time ``f_m = t0 + machine_busy_for[m]`` and every
    running job's completion time ``c_j = t0 + job_busy_for[j]`` are known at
    entry, and all per-event updates telescope over the whole span:

    * a job becomes a re-legalization candidate at
        - ``max(c_j, f_{m'})`` if running with a next op on machine ``m'``
          (its completion is itself an event; ``m'`` cannot be re-busied), or
        - ``max(first_event, f_{m_j})`` if waiting (legality is re-evaluated
          only at event times, hence the first-event clamp), each masked by
          the same pin/validity conditions as ``advance_time``'s ``cand``;
    * the loop stops at ``T = min(min_j e_j, last_event)`` (queue drains when
      no candidate exists), legalizing exactly the jobs with ``e_j == T``;
    * work/idle/hole accounting over ``[t0, T]`` telescopes:
      ``holes_m = (T - t0) - min(machine_busy_for[m], T - t0)``; each job
      completes at most one op in the span (no reallocation), at time ``c_j``.

    Stepwise-identical to iterating ``advance_time`` (tests/test_parity.py,
    golden replays); exists because a vmapped ``while_loop`` runs every lane
    for the max iteration count of the batch and relaunches the whole advance
    kernel per event — the closed form is one fused elementwise block.
    """
    jp, mp = state.jobs_pad, state.machines_pad
    t0 = state.time
    tua0 = state.machine_busy_for
    busy0 = tua0 > 0
    any_busy = jnp.any(busy0)
    active = (state.nb_machine_legal == 0) & any_busy
    first_ev = t0 + jnp.min(jnp.where(busy0, tua0, _I32_MAX))
    last_ev = t0 + jnp.max(tua0)

    running = state.job_busy_for > 0
    c = t0 + state.job_busy_for  # completion time of running jobs
    nxt_op = state.next_op + 1
    cont = running & (nxt_op < state.num_machines)
    m_next = jnp.clip(
        ops.row_gather(state.op_machine, jnp.clip(nxt_op, 0, mp - 1)), 0, mp - 1
    )
    f_next = t0 + ops.lookup(tua0, m_next)
    # no pin guard needed on cont jobs: they were running, hence unpinned, and
    # each job visits each machine once so m_next carries no stale pin
    run_ok = cont
    e_run = jnp.maximum(c, f_next)

    mj = jnp.clip(state.needed_machine, 0, mp - 1)
    waiting = (
        (~running)
        & (state.needed_machine >= 0)
        & ~state.legal
        & state.job_valid
        & ~state.noop_pin  # == the reference's illegal_actions[m_j][j] guard
    )
    e_wait = jnp.maximum(first_ev, t0 + ops.lookup(tua0, mj))
    e_j = jnp.where(run_ok, e_run, jnp.where(waiting, e_wait, _I32_MAX))
    T_stop = jnp.minimum(jnp.min(e_j), last_ev)
    span = T_stop - t0

    # ---- aggregate per-job update over [t0, T_stop] ----
    performed = jnp.where(running, jnp.minimum(span, state.job_busy_for), 0)
    job_busy_for = jnp.where(
        running, jnp.maximum(0, state.job_busy_for - span), state.job_busy_for
    )
    work_done = state.work_done + performed
    completed = running & (c <= T_stop)
    op_end_at = jnp.where(completed, c, state.op_end_at)
    next_op = state.next_op + completed.astype(jnp.int32)
    finished_now = completed & (next_op == state.num_machines)
    continues = completed & (next_op < state.num_machines)
    needed_machine = jnp.where(
        continues, m_next, jnp.where(finished_now, -1, state.needed_machine)
    )
    wait4 = jnp.where(continues, jnp.maximum(0, f_next - c), state.wait4)
    drop_legal = finished_now & state.legal
    legal = state.legal & ~drop_legal
    nb_legal = state.nb_legal - jnp.sum(drop_legal, dtype=jnp.int32)

    # ---- aggregate per-machine update ----
    m_valid = state.machine_valid
    holes = jnp.sum(
        jnp.where(m_valid, span - jnp.minimum(tua0, span), 0), dtype=jnp.int32
    )
    machine_busy_for = jnp.maximum(0, tua0 - span)

    # ---- re-legalization at T_stop ----
    cand = e_j == T_stop  # e_j == INT32_MAX lanes can never match (T <= last_ev)
    legal = legal | cand
    nb_legal = nb_legal + jnp.sum(cand, dtype=jnp.int32)
    m_of_cand = jnp.where(run_ok, m_next, mj)
    ml_add = ops.segment_any(m_of_cand, cand, mp)
    nb_machine_legal = state.nb_machine_legal + jnp.sum(
        ml_add & ~state.machine_legal, dtype=jnp.int32
    )
    machine_legal = state.machine_legal | ml_add

    sel = lambda new, old: jnp.where(active, new, old)
    new_state = state.replace(
        time=sel(T_stop, state.time),
        legal=sel(legal, state.legal),
        nb_legal=sel(nb_legal, state.nb_legal),
        nb_machine_legal=sel(nb_machine_legal, state.nb_machine_legal),
        machine_legal=sel(machine_legal, state.machine_legal),
        machine_busy_for=sel(machine_busy_for, state.machine_busy_for),
        job_busy_for=sel(job_busy_for, state.job_busy_for),
        next_op=sel(next_op, state.next_op),
        work_done=sel(work_done, state.work_done),
        needed_machine=sel(needed_machine, state.needed_machine),
        op_end_at=sel(op_end_at, state.op_end_at),
        wait4=sel(wait4, state.wait4),
    )
    return new_state, jnp.where(active, holes, 0)


# ---------------------------------------------------------------------------
# mask-shaping heuristics (part of the env contract, SURVEY.md §2.3.5)
# ---------------------------------------------------------------------------


def prioritization_non_final(state: EnvState) -> EnvState:
    """Vectorized reference ``_prioritization_non_final`` (jss_env.py:183-254).

    Per legal machine: among competing legal jobs, if any non-final-op job whose
    *next* op's machine is currently free exists, mask out every final-op job
    whose duration exceeds the minimum such non-final duration. Implemented as
    two masked segment reductions over machines.
    """
    jp, mp = state.jobs_pad, state.machines_pad
    m_of = jnp.clip(state.needed_machine, 0, mp - 1)
    cand = state.legal & (state.needed_machine >= 0)
    gate = ops.lookup(state.machine_legal, m_of)
    op_clip = jnp.clip(state.next_op, 0, mp - 1)
    dur_cur = ops.row_gather(state.op_dur, op_clip)
    is_final = state.next_op == (state.num_machines - 1)
    next_m = ops.row_gather(state.op_machine, jnp.clip(state.next_op + 1, 0, mp - 1))
    eligible_nf = (
        cand & gate & ~is_final & (ops.lookup(state.machine_busy_for, next_m) == 0)
    )
    min_nf = ops.segment_min(m_of, dur_cur, eligible_nf, mp)
    # "some eligible non-final job exists on m" is already encoded by
    # min_nf[m] < INT32_MAX (durations are finite), so no separate segment_any
    kill = cand & gate & is_final & (dur_cur > ops.lookup(min_nf, m_of))
    return state.replace(
        legal=state.legal & ~kill,
        nb_legal=state.nb_legal - jnp.sum(kill, dtype=jnp.int32),
    )


def check_no_op(state: EnvState) -> EnvState:
    """Vectorized reference ``_check_no_op`` (jss_env.py:256-401).

    Decides whether waiting (no-op) is legal: gated on a non-empty event queue,
    ≤3 legal machines and ≤4 legal actions; pass 1 computes per-machine time
    horizons from legal jobs (with an early-out if any legal job finishes
    before the next event); pass 2 walks the future op chains of illegal jobs
    (bounded by ``num_machines - 1``) collecting machines that would be better
    used by waiting; no-op becomes legal iff that set covers all legal machines.

    The reference's order-dependent running ``max_horizon`` (it takes a max of
    the per-machine running min after each legal job in index order,
    jss_env.py:318-321) is reproduced with a (J, J) prefix-min matrix — cheap at
    J ≤ 128. The data-dependent while-walk (jss_env.py:339-401) is monotone
    (positions increase, accumulated time is non-decreasing), so its iteration
    set equals a pointwise condition on a precomputed cumulative-sum tensor —
    no loop is needed at all.
    """
    jp, mp = state.jobs_pad, state.machines_pad
    j_idx = jnp.arange(jp, dtype=jnp.int32)
    busy = state.machine_busy_for > 0
    any_busy = jnp.any(busy)
    gate = any_busy & (state.nb_machine_legal <= 3) & (state.nb_legal <= 4)
    next_ev = state.time + jnp.min(
        jnp.where(busy, state.machine_busy_for, _I32_MAX)
    )

    # ---- pass 1: horizons from legal jobs (jss_env.py:304-321) ----
    lj = state.legal
    op_clip = jnp.clip(state.next_op, 0, mp - 1)
    # the machine of an unfinished job's current op IS needed_machine (state
    # invariant), so no gather into op_machine is needed
    m1 = jnp.clip(state.needed_machine, 0, mp - 1)
    t1 = ops.row_gather(state.op_dur, op_clip)
    end = state.time + t1
    early_out = jnp.any(lj & (end < next_ev))
    cap = state.time + state.max_time_op

    # The reference computes max_horizon as a running max over legal jobs (in
    # index order) of the per-machine running min of min(cap, end). The running
    # min per machine is non-increasing, so each machine's contribution to the
    # max is attained at its FIRST legal job: max_horizon = max over machines
    # with a legal job of min(cap, end[first legal job on m]) — no (J, J)
    # prefix structure needed.
    first_j = ops.segment_min(m1, j_idx, lj, mp)  # (M,) first legal job index
    has_legal_m = first_j != _I32_MAX
    end_first = ops.lookup(end, jnp.clip(first_j, 0, jp - 1))
    contrib = jnp.where(has_legal_m, jnp.minimum(cap, end_first), -_I32_MAX)
    max_horizon = jnp.maximum(state.time, jnp.max(contrib))

    # final per-machine horizon used by pass 2
    mh = jnp.minimum(cap, ops.segment_min(m1, end, lj, mp))

    # ---- pass 2: op-chain walk of illegal jobs (jss_env.py:323-401) ----
    illegal = ~state.legal & state.job_valid
    case1 = illegal & (state.job_busy_for > 0) & (state.next_op + 1 < state.num_machines)
    case2 = illegal & ~case1 & ~state.noop_pin & (state.next_op < state.num_machines)
    start = jnp.where(case1, state.next_op + 1, state.next_op)
    active = case1 | case2

    # The walk from op ``start`` accumulates durations: at absolute position p
    # the accumulated time is tn0 + (cum_excl[p] - cum_excl[start]). Both terms
    # are available WITHOUT any gather or per-step cumsum:
    #   * cum_excl[start] is derivable from work_done — for a waiting job
    #     (case2) work_done == cum_excl[next_op]; for a running job (case1)
    #     cum_excl[next_op + 1] == work_done + job_busy_for — so
    #     base = tn0 - cum_excl[start] simplifies per case as below;
    #   * cum_excl re-indexed BY MACHINE is the static ``cum_before`` table
    #     (each job visits each machine exactly once), and the position of
    #     machine m in job j's walk is the static ``op_pos`` table.
    # The per-(job, position) walk therefore becomes a per-(job, machine)
    # elementwise test plus one J-axis min — no M-expanded segment reduction.
    base = jnp.where(
        case1,
        state.time - state.work_done,
        state.time + ops.lookup(state.machine_busy_for, m1) - state.work_done,
    )
    pos = state.op_pos  # (J, M) position of machine m in job j's sequence
    tn_at = base[:, None] + state.cum_before  # (J, M) walk time at machine m
    ok_at = (
        active[:, None]
        & (pos >= start[:, None])
        & (pos < (state.num_machines - 1))
        & (max_horizon > tn_at)
    )
    # A machine m is "covered" iff some walked op on m has tn < mh[m] (and m is
    # legal); any(tn < mh[m]) == (min tn < mh[m]).
    tn_min = jnp.min(jnp.where(ok_at, tn_at, _I32_MAX), axis=0)  # (M,)
    all_covered = jnp.all(~state.machine_legal | (tn_min < mh))
    noop = gate & ~early_out & (state.nb_machine_legal > 0) & all_covered
    return state.replace(noop_legal=noop)


# ---------------------------------------------------------------------------
# step (reference jss_env.py:403-481)
# ---------------------------------------------------------------------------


def step(state: EnvState, action: jax.Array) -> Tuple[EnvState, Transition]:
    """One agent step: allocate job ``action`` or wait (``action >= num_jobs``).

    Branch-free formulation: the allocation branch (jss_env.py:441-481) and the
    no-op branch (jss_env.py:419-440) are expressed as masked updates sharing
    one closed-form fast-forward and one heuristic epilogue, so a vmapped
    batch never pays for both branches twice.

    All single-element updates are one-hot masked writes rather than dynamic
    scatters: scatters are slower on TPU, and batched single-element bool
    scatters were observed to MISCOMPILE on TPU at batch >= 1024 (silently
    dropping the update) — see tests/test_vector.py::test_large_batch_stats.
    """
    jp, mp = state.jobs_pad, state.machines_pad
    j_idx = jnp.arange(jp, dtype=jnp.int32)
    m_idx = jnp.arange(mp, dtype=jnp.int32)
    action = jnp.asarray(action, jnp.int32)
    is_noop = action >= state.num_jobs
    is_alloc = ~is_noop

    # --- allocation pre-updates ---
    a = jnp.where(is_alloc, jnp.clip(action, 0, jp - 1), 0)
    op = jnp.clip(state.next_op[a], 0, mp - 1)
    m = jnp.clip(state.needed_machine[a], 0, mp - 1)
    dur = state.op_dur[a, op].astype(jnp.int32)
    raw_reward = jnp.where(is_alloc, dur, 0)

    row_a = (j_idx == a) & is_alloc  # (J,) one-hot of the allocated job
    row_m = (m_idx == m) & is_alloc  # (M,) one-hot of the allocated machine

    kill_alloc = is_alloc & state.legal & (state.needed_machine == state.needed_machine[a])
    machine_busy_for = jnp.where(row_m, dur, state.machine_busy_for)
    # the reference's obs[a, 1] = dur / max_time_op write (jss_env.py:448) is
    # implied: column 1 is derived from job_busy_for (EnvState.obs)
    job_busy_for = jnp.where(row_a, dur, state.job_busy_for)
    # freeze the allocated job's lazy idle accounting at the allocation time
    # (the reference's stored values simply stop accruing while running,
    # jss_env.py:594-601; allocations happen at the current clock, which the
    # last advance already accrued to)
    idle_span = state.time - state.op_end_at
    idle_frozen = jnp.where(row_a, idle_span, state.idle_frozen)
    idle_total_alloc = state.idle_total_alloc + jnp.where(row_a, idle_span, 0)
    # "light" states (vector.strip_solution) carry a zero-row solution; the
    # shape test is static, so one step definition serves both modes
    if state.solution.shape[-2]:
        solution = jnp.where(
            row_a[:, None] & (m_idx == op)[None, :], state.time, state.solution
        )
    else:
        solution = state.solution
    # clear sticky pins on the allocated machine (jss_env.py:464-467): pinned
    # jobs are exactly the noop_pin jobs whose needed machine is m (state.pin)
    nm_clip = jnp.clip(state.needed_machine, 0, mp - 1)
    unpin = is_alloc & (nm_clip == m)
    noop_pin = state.noop_pin & ~unpin

    # --- no-op pre-updates (pin every legal job on its machine) ---
    noop_pin = noop_pin | (is_noop & state.legal)
    # machines holding a then-legal job lose machine legality on no-op
    ml_clear_noop = ops.segment_any(nm_clip, state.legal, mp)

    legal = state.legal & ~kill_alloc & ~is_noop
    nb_legal = jnp.where(
        is_noop, 0, state.nb_legal - jnp.sum(kill_alloc, dtype=jnp.int32)
    )
    machine_legal = jnp.where(
        is_noop,
        state.machine_legal & ~ml_clear_noop,
        state.machine_legal & ~row_m,
    )
    nb_machine_legal = jnp.where(
        is_noop, 0, state.nb_machine_legal - 1
    )

    state = state.replace(
        legal=legal,
        nb_legal=nb_legal,
        machine_legal=machine_legal,
        nb_machine_legal=nb_machine_legal,
        machine_busy_for=machine_busy_for,
        job_busy_for=job_busy_for,
        solution=solution,
        noop_pin=noop_pin,
        idle_frozen=idle_frozen,
        idle_total_alloc=idle_total_alloc,
    )

    # --- auto fast-forward until some machine is legal (jss_env.py:469-470,
    # 429-430). The no-op branch of the reference has no queue-emptiness guard
    # (it would crash on an empty queue); ``fast_forward``'s any-busy gate
    # makes that case terminate instead. The whole event loop collapses to one
    # closed-form update (see fast_forward) — no while_loop, no per-event
    # kernel relaunch, no vmap max-iteration tax.
    state, holes = fast_forward(state)
    raw_reward = raw_reward - holes

    # --- epilogue: heuristics + scaling (jss_env.py:431-433, 471-474) ---
    state = prioritization_non_final(state)
    state = check_no_op(state)
    reward = raw_reward.astype(jnp.float32) / state.max_time_op.astype(jnp.float32)
    return state, Transition(reward=reward, raw_reward=raw_reward, done=state.done)
