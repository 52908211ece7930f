"""EnvState: the full simulator state as one struct-of-arrays JAX pytree.

This is the TPU-native reformulation of the reference env's 13 state arrays +
scalars (reference: JSSEnv/envs/jss_env.py:145-181, documented in SURVEY.md
§2.2). Everything is a fixed-shape int32/bool/float32 array so that:

* ``step``/``reset`` are pure functions of ``EnvState`` → jit/vmap/shard_map
  compose over it directly;
* the state of B envs is just the same pytree with a leading batch axis;
* checkpoint/resume is a plain pytree save (orbax or ``numpy.savez``).

The reference's variable-length event queue (``next_time_step``/``next_jobs``,
jss_env.py:155-156) is deliberately NOT part of the state: the popped event
always equals ``current_time + min(machine_busy_for where > 0)``, so the queue
is reconstructed as a min-reduction (SURVEY.md §2.3.2). Padded lanes (ragged
instance batches) are encoded by ``num_jobs``/``num_machines`` being smaller
than the array dims; padded jobs look permanently finished and padded machines
permanently free-and-unneeded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    """State of one job-shop scheduling env (or a batch, with a leading axis).

    Static instance fields (unchanged across steps):
      op_machine:    (J, M) int32  machine id of op k of job j  (padding: 0)
      op_dur:        (J, M) int32  integer duration of op k of job j (padding: 0)
      op_pos:        (J, M) int32  position (op index) of machine m in job j's
                                   sequence — the inverse permutation of
                                   op_machine rows (each job visits each machine
                                   exactly once); ``machines_pad`` sentinel where
                                   machine m does not appear (padding)
      cum_before:    (J, M) int32  total work of job j's ops BEFORE its op on
                                   machine m (exclusive duration prefix sum,
                                   re-indexed by machine); 0 on padding
      num_jobs:      ()  int32     real J for this env
      num_machines:  ()  int32     real M for this env
      max_time_op:   ()  int32     max single-op duration (obs/reward normalizer)
      max_time_jobs: ()  int32     max total job work (obs normalizer)
      sum_op:        ()  int32     total work in the instance (obs normalizer)

    Dynamic fields (reference counterparts in parentheses):
      time:            () int32     simulation clock (current_time_step)
      legal:           (J,) bool    per-job action mask (legal_actions[:-1])
      noop_legal:      () bool      no-op slot of the mask (legal_actions[-1])
      nb_legal:        () int32     cached count of legal jobs (nb_legal_actions)
      nb_machine_legal:() int32     cached count of legal machines
      machine_legal:   (M,) bool    machine free AND has a legal candidate
      solution:        (J, M) int32 op start times, -1 = unscheduled
      machine_busy_for:(M,) int32   remaining busy time per machine
                                    (time_until_available_machine)
      job_busy_for:    (J,) int32   remaining time of a job's running op
                                    (time_until_finish_current_op_jobs)
      next_op:         (J,) int32   index of next op per job; == num_machines
                                    when the job is finished (todo_time_step_job)
      work_done:       (J,) int32   total performed work (total_perform_op_time_jobs)
      needed_machine:  (J,) int32   machine of the job's current/next op, -1 when
                                    finished (needed_machine_jobs)
      op_end_at:       (J,) int32   wall-clock time the job's last op completed
                                    (0 before any completion). Idle accounting
                                    is derived from this lazily instead of
                                    being accrued on every time advance: while
                                    a job waits, its idle-since-last-op is
                                    exactly ``time - op_end_at`` (completions
                                    always coincide with the popped event, so
                                    the reference's per-advance accruals
                                    telescope to this difference); the value is
                                    frozen into ``idle_frozen`` at allocation
                                    (see properties ``idle_since_op`` /
                                    ``idle_total``)
      idle_frozen:     (J,) int32   idle-since-last-op frozen at the job's last
                                    allocation (the visible value while running)
      idle_total_alloc:(J,) int32   cumulative idle as of the job's last
                                    allocation (total_idle_time_jobs is this
                                    plus the current waiting span)
      noop_pin:        (J,) bool    job currently no-op-pinned (action_illegal_no_op).
                                    The reference's (M, J) ``illegal_actions``
                                    pin table is NOT stored: a job is only ever
                                    pinned on its CURRENT needed machine, so
                                    the table is derived (see ``pin``)
      wait4:           (J,) int32   raw integer value behind obs column 4: the
                                    "wait until the needed machine frees"
                                    captured when the job last completed an op
                                    (jss_env.py:569-578). This is the ONLY obs
                                    quantity that is not a pure function of the
                                    other state fields — every other column of
                                    the reference's normalized ``state`` matrix
                                    is derived on demand (see ``obs``), which
                                    keeps the (J, 7) float matrix out of the
                                    fast-forward while_loop carry entirely.
    """

    # static instance data
    op_machine: jax.Array
    op_dur: jax.Array
    op_pos: jax.Array
    cum_before: jax.Array
    num_jobs: jax.Array
    num_machines: jax.Array
    max_time_op: jax.Array
    max_time_jobs: jax.Array
    sum_op: jax.Array
    # dynamic simulation state
    time: jax.Array
    legal: jax.Array
    noop_legal: jax.Array
    nb_legal: jax.Array
    nb_machine_legal: jax.Array
    machine_legal: jax.Array
    solution: jax.Array
    machine_busy_for: jax.Array
    job_busy_for: jax.Array
    next_op: jax.Array
    work_done: jax.Array
    needed_machine: jax.Array
    op_end_at: jax.Array
    idle_frozen: jax.Array
    idle_total_alloc: jax.Array
    noop_pin: jax.Array
    wait4: jax.Array

    # Fields that never change after init_state. Loops and auto-reset selects
    # must NOT carry/select these (see engine.step's fast-forward carry and
    # vector.step_autoreset): carrying them through a batched while_loop or
    # per-lane select costs full (B, J, M) HBM round-trips per iteration.
    STATIC_FIELDS = (
        "op_machine",
        "op_dur",
        "op_pos",
        "cum_before",
        "num_jobs",
        "num_machines",
        "max_time_op",
        "max_time_jobs",
        "sum_op",
    )

    def dynamic_fields(self) -> dict:
        """The non-static fields as a dict (the mutable simulation state)."""
        return {
            k: getattr(self, k)
            for k in self.__dataclass_fields__
            if k not in self.STATIC_FIELDS
        }

    # --- conveniences -----------------------------------------------------
    @property
    def jobs_pad(self) -> int:
        return self.op_machine.shape[-2]

    @property
    def machines_pad(self) -> int:
        return self.op_machine.shape[-1]

    @property
    def job_valid(self) -> jax.Array:
        """(J,) bool — which job lanes are real (not padding)."""
        return jnp.arange(self.jobs_pad, dtype=jnp.int32) < self.num_jobs

    @property
    def machine_valid(self) -> jax.Array:
        """(M,) bool — which machine lanes are real (not padding)."""
        return jnp.arange(self.machines_pad, dtype=jnp.int32) < self.num_machines

    @property
    def pin(self) -> jax.Array:
        """(..., M, J) bool — the reference's ``illegal_actions`` pin table
        (jss_env.py:171, 427, 465-467, 622-625), derived.

        Invariant: pins are set on no-op only for then-legal (hence waiting)
        jobs on their current needed machine, and cleared exactly when that
        machine is next allocated — before the job can run or advance. So a
        job is only ever pinned on its current needed machine:
        ``pin[m, j] == noop_pin[j] & (needed_machine[j] == m)``. Storing only
        ``noop_pin`` keeps a (B, M, J) tensor out of the hot rollout carry.
        """
        m_idx = jnp.arange(self.machines_pad, dtype=jnp.int32)
        return jnp.asarray(self.noop_pin)[..., None, :] & (
            jnp.asarray(self.needed_machine)[..., None, :]
            == m_idx[..., :, None]
        )

    @property
    def any_busy(self) -> jax.Array:
        """() bool — event queue non-empty ⇔ some machine still busy."""
        return jnp.any(self.machine_busy_for > 0)

    @property
    def next_event_time(self) -> jax.Array:
        """() int32 — earliest future completion event (undefined if none busy).

        Equals the head of the reference's sorted ``next_time_step`` list.
        """
        busy = self.machine_busy_for > 0
        return self.time + jnp.min(
            jnp.where(busy, self.machine_busy_for, jnp.iinfo(jnp.int32).max)
        )

    @property
    def done(self) -> jax.Array:
        """() bool — episode over (reference _is_done: nb_legal_actions == 0)."""
        return self.nb_legal == 0

    def action_mask(self) -> jax.Array:
        """(J+1,) bool mask in reference layout: jobs then the no-op slot.

        Note the no-op slot sits at padded index J (== jobs_pad), while the
        *action id* for no-op remains ``num_jobs`` (see core.engine.step).
        """
        return jnp.concatenate([self.legal, self.noop_legal[None]])

    @property
    def idle_since_op(self) -> jax.Array:
        """(..., J) int32 — the reference's ``idle_time_jobs_last_op``, derived.

        Waiting jobs: ``time - op_end_at`` (the per-advance accruals at
        jss_env.py:552-555, 596-601 telescope to exactly this — a completing
        job's remaining time always equals the popped event delta, so the
        completion-time accrual is 0 and waiting spans sum to the full
        interval). Running jobs: frozen at allocation. Finished jobs: 0.
        """
        running = jnp.asarray(self.job_busy_for) > 0
        finished = jnp.asarray(self.next_op) >= jnp.asarray(self.num_machines)[..., None]
        span = jnp.asarray(self.time)[..., None] - jnp.asarray(self.op_end_at)
        return jnp.where(
            running, self.idle_frozen, jnp.where(finished, 0, span)
        ).astype(jnp.int32)

    @property
    def idle_total(self) -> jax.Array:
        """(..., J) int32 — the reference's ``total_idle_time_jobs``, derived
        (see ``idle_since_op``): cumulative idle at last allocation plus the
        current waiting span."""
        running = jnp.asarray(self.job_busy_for) > 0
        finished = jnp.asarray(self.next_op) >= jnp.asarray(self.num_machines)[..., None]
        span = jnp.asarray(self.time)[..., None] - jnp.asarray(self.op_end_at)
        return (
            self.idle_total_alloc + jnp.where(running | finished, 0, span)
        ).astype(jnp.int32)

    @property
    def obs(self) -> jax.Array:
        """(..., J, 7) float32 — the reference's normalized ``state`` matrix,
        derived from the integer state (writers at jss_env.py:441-601).

        Every column except 4 is a pure function of the current integer state
        (the reference's conditional writes always fire exactly when the
        underlying integer quantity changes, so "last written value" ==
        "current value"); column 4 carries its own history in ``wait4`` with a
        1.0 sentinel for finished jobs (jss_env.py:586). Column 0 is left 0
        here and assembled in ``observation()``, exactly like the reference's
        stored ``state`` before ``_get_current_state_representation`` runs.
        Broadcasts over any leading batch axes.
        """
        f32 = jnp.float32
        nj = jnp.asarray(self.num_jobs)[..., None]
        valid = jnp.arange(self.jobs_pad, dtype=jnp.int32) < nj  # (..., J)
        max_op = jnp.asarray(self.max_time_op)[..., None].astype(f32)
        max_jobs = jnp.asarray(self.max_time_jobs)[..., None].astype(f32)
        sum_op = jnp.asarray(self.sum_op)[..., None].astype(f32)
        nm = jnp.asarray(self.num_machines)[..., None].astype(f32)
        finished = jnp.asarray(self.needed_machine) == -1
        cols = jnp.stack(
            [
                jnp.zeros_like(jnp.asarray(self.job_busy_for), dtype=f32),
                self.job_busy_for.astype(f32) / max_op,
                self.next_op.astype(f32) / nm,
                self.work_done.astype(f32) / max_jobs,
                jnp.where(finished, 1.0, self.wait4.astype(f32) / max_op),
                self.idle_since_op.astype(f32) / sum_op,
                self.idle_total.astype(f32) / sum_op,
            ],
            axis=-1,
        )
        return jnp.where(valid[..., None], cols, 0.0)

    def observation(self) -> dict:
        """Reference-shaped observation dict (jss_env.py:121-134)."""
        obs = self.obs
        obs = obs.at[..., 0].set(self.legal.astype(obs.dtype))
        return {"real_obs": obs, "action_mask": self.action_mask()}

    @property
    def rich_obs(self) -> jax.Array:
        """(..., J, 13) float32 — the reference's 7 columns plus 6 channels
        aligned with the dispatching-rule priority kernels (a beyond-reference
        feature set for the learner; the reference's 7 columns were designed
        for its external RLlib setup, not for this policy). Extra columns:

          7  current-op duration / max_time_op            (the SPT key)
          8  remaining work / max_time_jobs               (MWR/LWR key)
          9  remaining ops / num_machines                 (MOR/LOR key)
          10 critical ratio (due-by-1.5x rule), clipped   (CR key)
          11 busy time left on the job's needed machine / max_time_op
          12 legal jobs competing for the same machine / num_jobs

        All one-hot/masked reductions — no gathers (core/ops lesson).
        """
        f32 = jnp.float32
        base = self.obs  # (..., J, 7), already padding-masked
        mp = self.op_dur.shape[-1]
        pos = jnp.arange(mp, dtype=jnp.int32)
        next_op = jnp.asarray(self.next_op)
        not_started = pos >= next_op[..., None]
        dur = jnp.asarray(self.op_dur)
        rem_work = jnp.sum(jnp.where(not_started, dur, 0), axis=-1).astype(f32)
        cur_oh = pos == jnp.clip(next_op, 0, mp - 1)[..., None]
        cur_dur = jnp.sum(jnp.where(cur_oh, dur, 0), axis=-1).astype(f32)
        nm = jnp.asarray(self.num_machines)[..., None].astype(f32)
        nj = jnp.asarray(self.num_jobs)[..., None].astype(f32)
        max_op = jnp.asarray(self.max_time_op)[..., None].astype(f32)
        max_jobs = jnp.asarray(self.max_time_jobs)[..., None].astype(f32)
        total = jnp.sum(dur, axis=-1).astype(f32)
        t = jnp.asarray(self.time)[..., None].astype(f32)
        cr = jnp.clip(
            (1.5 * total - t) / jnp.maximum(rem_work, 1.0), 0.0, 4.0
        ) / 4.0
        finished = next_op >= jnp.asarray(self.num_machines)[..., None]
        rem_ops = jnp.where(
            finished, 0.0, (nm - next_op.astype(f32)) / nm
        )
        needed = jnp.asarray(self.needed_machine)  # (..., J), -1 when finished
        ohm = needed[..., None] == jnp.arange(self.machines_pad, dtype=jnp.int32)
        busy = jnp.asarray(self.machine_busy_for)[..., None, :]  # (..., 1, M)
        needed_busy = jnp.sum(jnp.where(ohm, busy, 0), axis=-1).astype(f32)
        legal = jnp.asarray(self.legal)
        same = (needed[..., :, None] == needed[..., None, :]) & (needed[..., None, :] >= 0)
        contention = jnp.sum(
            jnp.where(same & legal[..., None, :], 1, 0), axis=-1
        ).astype(f32)
        extra = jnp.stack(
            [
                cur_dur / max_op,
                rem_work / max_jobs,
                rem_ops,
                cr,
                needed_busy / max_op,
                contention / nj,
            ],
            axis=-1,
        )
        valid = jnp.arange(self.jobs_pad, dtype=jnp.int32) < jnp.asarray(
            self.num_jobs
        )[..., None]
        return jnp.concatenate([base, jnp.where(valid[..., None], extra, 0.0)], axis=-1)
