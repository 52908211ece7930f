"""On-device schedule-space refinement: batched simulated annealing.

Second search stage behind :mod:`jssenv_tpu.solve` (and usable standalone).
Where ``solve`` searches in *policy* space (noisy dispatching rollouts, one
env step per allocation), this module searches in *schedule* space: a
candidate is a per-machine job order, its makespan is the longest path of the
induced precedence DAG, and thousands of annealing chains run in lockstep on
device with moves drawn from the *critical-path neighborhood*: ops are
marked critical via a forward sweep (heads) plus a sweep of the
time-reversed instance (tails) — critical iff
``head + dur + tail == makespan`` — and proposals swap a uniformly sampled
machine-adjacent critical pair (the only adjacent swaps that can reduce the
makespan; Nowicki & Smutnicki's candidate set), with a small random-swap mix
for ergodicity and an optional critical-block *insertion* move
(``p_insert``; see ``anneal()``).

The evaluator (``evaluate_orders``) computes the semi-active schedule of an
order batch by order-driven frontier sweeps: every machine tries to start its
next-in-order job each sweep; an op is committed once its job predecessor and
machine predecessor are final, so the sweep loop converges to exactly the DAG
longest path (one ``lax.while_loop``, all 2-D (B, J)/(B, M) tensors, no
scatters). Infeasible orders (precedence cycles, reachable via swaps) are
detected as stalled lanes and priced at INT32_MAX.

Certification: the search treats DAG makespans as the objective; the final
winner should be re-verified through the exact environment semantics with
``jssenv_tpu.replay.replay_machine_order`` (``solve.solve(refine_iters=...)``
does this automatically).

Golden anchor: ``evaluate_orders`` on the published-optimal ta01 order yields
exactly 1231 (tests/test_anneal.py) — the published optima are the semi-active
schedules of their orders.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_I32_MAX = jnp.iinfo(jnp.int32).max
_RESTART_EVERY = 250  # anneal intensification period (iterations)

# Frontier-sweep body passes per while_loop iteration. The body is
# IDEMPOTENT once a lane converges or stalls, so K passes per condition
# check are semantically identical (verified bitwise-equal for K=1 vs 4).
# A clean on-chip A/B (ta41, B=1024, 2000 anneal iters) measured K=4 at
# 37.9ms/iter vs K=1 at 37.2 — the while_loop condition check is NOT a
# material cost on v5e, so the default stays 1; the env knob remains for
# other backends/toolchains. (Anneal iteration cost DOES grow ~linearly
# with batch beyond ~1024 lanes and up to ~5x with schedule quality — the
# DAG gets deeper as schedules get better.)
_SWEEP_UNROLL = max(1, int(os.environ.get("JSS_SWEEP_UNROLL", "1")))


def schedule_tables(op_machine, op_dur, op_pos) -> Tuple[jax.Array, ...]:
    """Static tables the evaluator needs: machine ids, op positions, and
    durations re-indexed by machine (dur_by_machine[j, m] = duration of job
    j's op on machine m).

    Accepts ``(J, M)`` tensors (one instance, shared by every lane) or
    ``(B, J, M)`` stacks (one instance PER LANE — every sweep/anneal/tabu
    entry point then refines B different instances in one device call; the
    instances must share the padded (J, M) shape). Lane b of an orders
    batch is always evaluated against table row b (or the shared table)."""
    op_machine = jnp.asarray(op_machine, jnp.int32)
    op_dur = jnp.asarray(op_dur, jnp.int32)
    op_pos = jnp.asarray(op_pos, jnp.int32)
    mp = op_machine.shape[-1]
    dur_by_machine = jnp.take_along_axis(
        op_dur, jnp.clip(op_pos, 0, mp - 1), axis=-1
    )
    return op_machine, op_pos, dur_by_machine


def _sweep(tables, orders: jax.Array):
    """Order-driven frontier sweep (module docstring).

    Returns ``(mk (B,), starts (B, M, J))``: makespans (INT32_MAX when
    infeasible) and the start time of the op at each machine rank.
    """
    op_machine, op_pos, dur_by_machine = tables
    J, M = op_machine.shape[-2:]
    B = orders.shape[0]
    j_iota = jnp.arange(J, dtype=jnp.int32)
    r_iota = jnp.arange(J, dtype=jnp.int32)[None, None, :]
    m_iota3 = jnp.arange(M, dtype=jnp.int32)[None, None, :]

    # shared (J, M) tables ride a broadcast (1, ...) batch dim; per-lane
    # (B, J, M) stacks use their own row per lane (schedule_tables docstring)
    if op_machine.ndim == 2:
        om_b = op_machine[None]  # (1, J, M)
        op_pos_T = op_pos.T[None]  # (1, M, J)
        dur_T = dur_by_machine.T[None]  # (1, M, J)
    else:
        om_b = op_machine  # (B, J, M)
        op_pos_T = jnp.swapaxes(op_pos, -1, -2)
        dur_T = jnp.swapaxes(dur_by_machine, -1, -2)

    # Every dynamic index below lowers as a ONE-HOT masked reduction over the
    # tiny J/M axis, never take_along_axis: TPU gathers on these shapes are
    # ~40x slower (the same lesson as core/ops.JSS_ENGINE_LOWERING) and were
    # measured to dominate the whole annealing stage (123ms/iteration at
    # B=1024 on v5e, vs microseconds of actual vector work).
    def pick_j(vals3, oneh):
        """vals3 (B|1, X, J) * oneh (B, X, J) -> (B, X) masked row-pick."""
        return jnp.sum(jnp.where(oneh, vals3, 0), axis=2)

    def cond(c):
        ready, free, cnt, done, stuck, starts = c
        return jnp.any(~stuck & (jnp.sum(cnt, axis=1) < J * M))

    def body(c):
        ready, free, cnt, done, stuck, starts = c
        cnt_oh = r_iota == cnt[:, :, None]  # (B, M, J) one-hot of the rank
        h = pick_j(orders, cnt_oh)  # (B, M) next-in-order job per machine
        h = jnp.clip(h, 0, J - 1)
        h_oh = j_iota[None, None, :] == h[:, :, None]  # (B, M, J) job one-hot
        valid = cnt < J
        pos_h = pick_j(op_pos_T, h_oh)  # position of h's op on m
        done_h = pick_j(done[:, None, :], h_oh)  # (B, M)
        # commit machine m's head job iff that op is the job's current op
        # (its job predecessor is then final; the machine predecessor is
        # final by construction of the frontier)
        alloc = valid & ~stuck[:, None] & (pos_h == done_h)
        ready_h = pick_j(ready[:, None, :], h_oh)
        begin = jnp.maximum(ready_h, free)
        end = begin + pick_j(dur_T, h_oh)
        starts = jnp.where(
            alloc[:, :, None] & cnt_oh,
            begin[:, :, None],
            starts,
        )
        free = jnp.where(alloc, end, free)
        cnt = cnt + alloc.astype(jnp.int32)
        # reflect the committed ops on the job side (each job has its current
        # op on exactly one machine, so no conflicts)
        done_oh = m_iota3 == jnp.clip(done, 0, M - 1)[:, :, None]  # (B, J, M)
        mj = jnp.sum(jnp.where(done_oh, om_b, 0), axis=2)
        mj_oh = m_iota3 == mj[:, :, None]  # (B, J, M) machine one-hot
        alloc_j = (
            (done < M)
            & (jnp.sum(jnp.where(mj_oh, alloc[:, None, :], False), axis=2) > 0)
            & (jnp.sum(jnp.where(mj_oh, h[:, None, :], 0), axis=2) == j_iota)
        )
        end_j = jnp.sum(jnp.where(mj_oh, end[:, None, :], 0), axis=2)
        ready = jnp.where(alloc_j, end_j, ready)
        done = done + alloc_j.astype(jnp.int32)
        progressed = jnp.any(alloc, axis=1)
        stuck = stuck | (~progressed & (jnp.sum(cnt, axis=1) < J * M))
        return ready, free, cnt, done, stuck, starts

    def body_unrolled(c):
        for _ in range(_SWEEP_UNROLL):
            c = body(c)
        return c

    init = (
        jnp.zeros((B, J), jnp.int32),
        jnp.zeros((B, M), jnp.int32),
        jnp.zeros((B, M), jnp.int32),
        jnp.zeros((B, J), jnp.int32),
        jnp.zeros((B,), jnp.bool_),
        jnp.zeros((B, M, J), jnp.int32),
    )
    ready, free, cnt, done, stuck, starts = jax.lax.while_loop(
        cond, body_unrolled, init
    )
    complete = jnp.sum(cnt, axis=1) == J * M
    return jnp.where(complete, jnp.max(ready, axis=1), _I32_MAX), starts


def evaluate_orders(tables, orders: jax.Array) -> jax.Array:
    """(B,) int32 makespans of the semi-active schedules of ``orders``.

    ``orders[b, m, r]`` = the r-th job machine m processes. Infeasible orders
    return INT32_MAX.
    """
    return _sweep(tables, orders)[0]


def reverse_tables(tables):
    """Tables of the time-reversed instance (job op sequences flipped).

    The forward sweep of the reversed instance computes, for each op, the
    longest dependency chain *after* it in the original — its tail. Used for
    criticality: an op is on a critical path iff head + dur + tail == mk.
    """
    op_machine, op_pos, dur_by_machine = tables
    M = op_machine.shape[-1]
    return (
        jnp.flip(op_machine, axis=-1),  # flip each job's op sequence
        (M - 1) - op_pos,
        dur_by_machine,  # keyed by (job, machine): reversal-invariant
    )


def _tails(rtables, orders) -> jax.Array:
    """(B, M, J) tail lengths: longest dependency chain after each rank's op.

    The tail of the op at forward rank r = start of the same op in the
    time-reversed problem, where machine orders flip rank -> J-1-r.
    """
    _, starts_rev = _sweep(rtables, jnp.flip(orders, axis=2))
    return jnp.flip(starts_rev, axis=2)


def _critical_ops(tables, orders, mk, starts, tails) -> jax.Array:
    """(B, M, J) bool: rank r's op is on a critical path
    (head + dur + tail == makespan)."""
    _, _, dur_by_machine = tables
    B, M, J = orders.shape
    dur_T = (
        dur_by_machine.T
        if dur_by_machine.ndim == 2
        else jnp.swapaxes(dur_by_machine, -1, -2)
    )
    dur_rank = jnp.take_along_axis(
        jnp.broadcast_to(dur_T, (B, M, J)), orders, axis=2
    )
    return (starts + dur_rank + tails) == mk[:, None, None]


def _critical_pairs_from(tables, orders, mk, starts, tails) -> jax.Array:
    """``critical_pairs`` with the tails already computed (see ``_tails``)."""
    J = orders.shape[2]
    crit = _critical_ops(tables, orders, mk, starts, tails)
    pair = crit & jnp.roll(crit, -1, axis=2)
    return pair.at[:, :, J - 1].set(False)


def _block_bounds(crit: jax.Array):
    """Critical-block boundaries per rank: for each (lane, machine, rank r)
    with ``crit[r]`` True, ``s[r]``/``e[r]`` are the first/last rank of the
    maximal run of consecutive critical ranks containing r (the
    Nowicki-Smutnicki critical *block*). Pure cummax/cummin along the tiny
    rank axis — no gathers. Values at non-critical ranks are meaningless.
    """
    B, M, J = crit.shape
    pos = jnp.arange(J, dtype=jnp.int32)[None, None, :]
    last_nc = jax.lax.cummax(jnp.where(crit, -1, pos), axis=2)  # last non-crit <= r
    s = last_nc + 1
    next_nc = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(crit, J, pos), axis=2), axis=2),
        axis=2,
    )  # first non-crit >= r (J when none)
    e = next_nc - 1
    return s, e


def critical_pairs(tables, rtables, orders, mk, starts) -> jax.Array:
    """(B, M, J) bool: rank r is True iff the ops at ranks (r, r+1) of that
    machine are BOTH on a critical path (the Nowicki-Smutnicki adjacent-swap
    candidate set — swapping any other machine-adjacent pair can never reduce
    the makespan, and swapping a critical pair never creates a cycle).

    ``mk``/``starts`` must come from ``_sweep(tables, orders)``.
    """
    return _critical_pairs_from(tables, orders, mk, starts, _tails(rtables, orders))


def _sample_true(key, flat):
    """Uniformly sample one True index per row of ``flat`` (B, N) bool.

    Returns (idx (B,), any (B,)); idx is arbitrary where ``any`` is False.
    """
    counts = jnp.cumsum(flat.astype(jnp.int32), axis=1)
    total = counts[:, -1]
    u = jax.random.randint(key, total.shape, 0, jnp.maximum(total, 1))
    idx = jnp.argmax(counts > u[:, None], axis=1)
    return idx.astype(jnp.int32), total > 0


def orders_from_solutions(op_pos, solution: jax.Array) -> jax.Array:
    """(B, M, J) machine orders from (B, J, M) op start-time matrices
    (ties and -1 padding resolve by lowest job index via stable argsort).
    ``op_pos`` may be shared (J, M) or per-lane (B, J, M)."""
    B = solution.shape[0]
    J, M = op_pos.shape[-2:]
    start_by_machine = jnp.take_along_axis(
        solution, jnp.broadcast_to(jnp.clip(op_pos, 0, M - 1), (B, J, M)), axis=2
    )  # (B, J, M) start of job j's op on machine m
    return jnp.argsort(
        jnp.transpose(start_by_machine, (0, 2, 1)), axis=2, stable=True
    ).astype(jnp.int32)


def _swap_adjacent(orders, msel, p):
    """Swap ranks p and p+1 on machine msel, per lane."""
    B, M, J = orders.shape
    row = jnp.take_along_axis(orders, msel[:, None, None], axis=1)[:, 0, :]  # (B, J)
    v_p = jnp.take_along_axis(row, p[:, None], axis=1)[:, 0]
    v_q = jnp.take_along_axis(row, (p + 1)[:, None], axis=1)[:, 0]
    on_m = jnp.arange(M, dtype=jnp.int32)[None, :, None] == msel[:, None, None]
    pos = jnp.arange(J, dtype=jnp.int32)[None, None, :]
    sel_p = on_m & (pos == p[:, None, None])
    sel_q = on_m & (pos == (p + 1)[:, None, None])
    return jnp.where(
        sel_p, v_q[:, None, None], jnp.where(sel_q, v_p[:, None, None], orders)
    )


def _move_insert(orders, msel, p, q, to_front):
    """Remove one op and reinsert it at the far end of the rank segment
    [p, q] on machine ``msel``, per lane (the Nowicki-Smutnicki block
    *insertion* move; ``_swap_adjacent`` is the special case q == p+1).

    ``to_front`` True: the op at rank q moves to rank p (segment rotates
    right); False: the op at rank p moves to rank q (segment rotates left).
    Pure roll/where vector code — no gathers, no scatters. The result may be
    an infeasible order (precedence cycle); the sweep prices those INT32_MAX
    and Metropolis rejects them.
    """
    B, M, J = orders.shape
    row = jnp.take_along_axis(orders, msel[:, None, None], axis=1)[:, 0, :]  # (B, J)
    pos = jnp.arange(J, dtype=jnp.int32)[None, :]
    p_, q_ = p[:, None], q[:, None]
    v_p = jnp.sum(jnp.where(pos == p_, row, 0), axis=1)
    v_q = jnp.sum(jnp.where(pos == q_, row, 0), axis=1)
    right = jnp.where(pos == p_, v_q[:, None],
                      jnp.where((pos > p_) & (pos <= q_), jnp.roll(row, 1, axis=1), row))
    left = jnp.where(pos == q_, v_p[:, None],
                     jnp.where((pos >= p_) & (pos < q_), jnp.roll(row, -1, axis=1), row))
    new_row = jnp.where(to_front[:, None], right, left)
    on_m = jnp.arange(M, dtype=jnp.int32)[None, :, None] == msel[:, None, None]
    return jnp.where(on_m, new_row[:, None, :], orders)


# Max annealing iterations per device call. One XLA program that runs for
# minutes gets the whole TPU server process killed on hosted/relayed
# deployments (observed here: the axon relay's watchdog takes down the device
# mid-run — a 256-iteration chunk was still fatal at 30x20 — and every
# subsequent call fails UNAVAILABLE). Chunking costs one dispatch (~0.1s)
# per _CHUNK iterations and changes nothing numerically — the carry, RNG key
# and absolute-iteration temperature schedule flow through.
_CHUNK = 64


def anneal(
    tables,
    orders0: jax.Array,
    seed: jax.Array,
    iters: int = 2000,
    t0_frac: float = 0.08,
    t1_frac: float = 0.004,
    p_random: float = 0.05,
    p_insert: float = 0.0,
    tails_refresh: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Refine an order batch by simulated annealing; returns
    (best_orders (B, M, J), best_makespans (B,)).

    Moves (one per lane per iteration):

    * with probability ``p_insert``: a critical-block *insertion* — a
      uniformly sampled critical op moves to the front or back of its
      critical block (Nowicki-Smutnicki neighborhood; ``_move_insert``).
      Non-adjacent insertions can create precedence cycles; those price at
      INT32_MAX in the sweep and Metropolis rejects them. Default OFF: a
      round-4 A/B on ta41 at 4000 iterations measured p_insert=0.4 ~1%
      WORSE than pure pair swaps (2295/2314 vs 2275/2290 across seeds) —
      the long-range relocations disrupt more than they repair at these
      budgets; the hook stays for schedules/budgets where they pay off.
    * otherwise: an adjacent swap drawn uniformly from the lane's *critical
      pairs* (``critical_pairs`` — the only adjacent swaps that can reduce
      the makespan, and always cycle-free);
    * with probability ``p_random`` (or when no critical move exists) a
      uniformly random adjacent pair instead, for ergodicity.

    Metropolis acceptance with a geometric temperature schedule scaled per
    lane by the seed makespan (t0_frac/t1_frac of it). Runs in bounded
    device-call chunks (see _CHUNK).

    ``tails_refresh``: recompute op tail lengths (the reversed sweep behind
    the criticality test) only every k-th iteration. Makespans and
    acceptance stay EXACT (the forward sweep runs every iteration); only
    the candidate-move set sees up-to-(k-1)-iteration-stale criticality.
    k=1 is the exact neighborhood; k=4 cuts sweep cost ~1.6x for a
    near-identical search (the candidate set drifts slowly).
    """
    carry = _anneal_init(tables, orders0, seed)
    for i0 in range(0, int(iters), _CHUNK):
        n = min(_CHUNK, int(iters) - i0)
        carry = _anneal_chunk(
            tables, carry, jnp.int32(i0), n, int(iters), t0_frac, t1_frac,
            p_random, p_insert, tails_refresh,
        )
    _, _, (best_orders, best_mk, _), _ = carry
    return best_orders, best_mk


@jax.jit
def _anneal_init(tables, orders0, seed):
    mk0, starts0 = _sweep(tables, orders0)
    B = orders0.shape[0]
    if tables[0].ndim == 2:
        # lanes whose seed is infeasible anneal from the best feasible seed
        # (shared tables only — see _tabu_init on per-lane tables)
        ref = jnp.argmin(mk0)
        bad = mk0 == _I32_MAX
        orders0 = jnp.where(bad[:, None, None], orders0[ref][None], orders0)
        mk0 = jnp.where(bad, mk0[ref], mk0)
        starts0 = jnp.where(bad[:, None, None], starts0[ref][None], starts0)
    scale = jnp.maximum(mk0.astype(jnp.float32), 1.0)
    J = orders0.shape[2]
    M = orders0.shape[1]
    rtables = reverse_tables(tables)
    # tails are carried through the loop and refreshed by a reversed sweep
    # of the CURRENT orders every tails_refresh iterations (see anneal())
    tails0 = _tails(rtables, orders0)
    rng = jax.random.key(seed)
    cur0 = (orders0, mk0, starts0, tails0)
    return rng, cur0, cur0[:3], mk0


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _anneal_chunk(tables, chunk_carry, i0, n, iters, t0_frac, t1_frac,
                  p_random, p_insert=0.0, tails_refresh=1):
    rng, cur, best, mk_seed = chunk_carry
    # per-lane temperature scale is pinned to the SEED makespans for the
    # whole run (chunking must not change the schedule)
    scale = jnp.maximum(mk_seed.astype(jnp.float32), 1.0)
    B, M, J = cur[0].shape
    rtables = reverse_tables(tables)

    def body(i, carry):
        rng, cur, best = carry
        orders, mk, starts, tails = cur
        best_orders, best_mk, best_starts = best
        rng, k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(rng, 9)
        crit = _critical_ops(tables, orders, mk, starts, tails)
        cand = (crit & jnp.roll(crit, -1, axis=2)).at[:, :, J - 1].set(False)
        idx, has = _sample_true(k1, cand.reshape(B, M * J))
        msel_c, p_c = idx // J, idx % J
        msel_r = jax.random.randint(k2, (B,), 0, M, dtype=jnp.int32)
        p_r = jax.random.randint(k5, (B,), 0, J - 1, dtype=jnp.int32)
        use_crit = has & (jax.random.uniform(k4, (B,)) >= p_random)
        msel = jnp.where(use_crit, msel_c, msel_r)
        p = jnp.where(use_crit, p_c, p_r)
        prop_swap = _swap_adjacent(orders, msel, p)
        # critical-block insertion proposal (see anneal() docstring)
        s_blk, e_blk = _block_bounds(crit)
        idx_i, has_i = _sample_true(k6, crit.reshape(B, M * J))
        oh_i = jnp.arange(M * J, dtype=jnp.int32)[None, :] == idx_i[:, None]
        s_i = jnp.sum(jnp.where(oh_i, s_blk.reshape(B, M * J), 0), axis=1)
        e_i = jnp.sum(jnp.where(oh_i, e_blk.reshape(B, M * J), 0), axis=1)
        msel_i, r_i = idx_i // J, idx_i % J
        valid_front = r_i > s_i
        valid_back = r_i < e_i
        to_front = (jax.random.bernoulli(k7, 0.5, (B,)) & valid_front) | ~valid_back
        prop_ins = _move_insert(
            orders,
            msel_i,
            jnp.where(to_front, s_i, r_i),
            jnp.where(to_front, r_i, e_i),
            to_front,
        )
        use_ins = (
            use_crit
            & has_i
            & (valid_front | valid_back)
            & (jax.random.uniform(k8, (B,)) < p_insert)
        )
        prop = jnp.where(use_ins[:, None, None], prop_ins, prop_swap)
        mk_p, starts_p = _sweep(tables, prop)
        frac = (i0 + i).astype(jnp.float32) / float(max(iters - 1, 1))
        temp = scale * (t0_frac * (t1_frac / t0_frac) ** frac)
        delta = (mk_p - mk).astype(jnp.float32)
        accept = (mk_p < _I32_MAX) & (
            (delta <= 0) | (jax.random.uniform(k3, (B,)) < jnp.exp(-delta / temp))
        )
        sel3 = accept[:, None, None]
        orders = jnp.where(sel3, prop, orders)
        mk = jnp.where(accept, mk_p, mk)
        starts = jnp.where(sel3, starts_p, starts)
        better = mk_p < best_mk
        b3 = better[:, None, None]
        best_orders = jnp.where(b3, prop, best_orders)
        best_mk = jnp.where(better, mk_p, best_mk)
        best_starts = jnp.where(b3, starts_p, best_starts)
        # intensification: every _RESTART_EVERY iters, lanes that drifted
        # >5% above their own best snap back to it
        drifted = (jnp.mod(i0 + i, _RESTART_EVERY) == _RESTART_EVERY - 1) & (
            mk.astype(jnp.float32) > 1.05 * best_mk.astype(jnp.float32)
        )
        d3 = drifted[:, None, None]
        orders = jnp.where(d3, best_orders, orders)
        mk = jnp.where(drifted, best_mk, mk)
        starts = jnp.where(d3, best_starts, starts)
        # tails refresh: the reversed sweep runs on the CURRENT orders every
        # tails_refresh-th iteration (stale in between — acceptance is still
        # exact; only move sampling sees the staleness; see anneal())
        if tails_refresh <= 1:
            tails = _tails(rtables, orders)
        else:
            tails = jax.lax.cond(
                jnp.mod(i0 + i, tails_refresh) == tails_refresh - 1,
                lambda o: _tails(rtables, o),
                lambda o: tails,
                orders,
            )
        return rng, (orders, mk, starts, tails), (
            best_orders, best_mk, best_starts)

    rng, cur, best = jax.lax.fori_loop(0, n, body, (rng, cur, best))
    return rng, cur, best, mk_seed


# ---------------------------------------------------------------------------
# Tabu search (round-5): best-of-P-proposals with short-term move memory
# ---------------------------------------------------------------------------
#
# The canonical strong results on ta41-ta50 (Nowicki-Smutnicki TSAB,
# Taillard's TS) come from tabu search, not SA — consistent with the round-4
# measurement that extra SA move types priced under Metropolis don't help.
# This is the batched TPU shape of that idea: each of B chains samples P
# critical-pair swaps per iteration (all B*P proposals priced by ONE
# frontier-sweep batch), picks the best admissible one (not-tabu, or
# aspiration: better than the chain's own best), and ALWAYS moves — uphill
# moves escape local minima deterministically instead of by temperature
# luck. The inverse of the applied move becomes tabu for a randomized
# tenure.


def _neighbor_bounds(tables, orders, starts, tails, dur_rank):
    """Per-rank job-neighbor path bounds for the O(1) swap estimator.

    Returns ``(JPend, JStail)``, both (B, M, J) in RANK layout:
    ``JPend[b, m, r]`` = completion time of the JOB predecessor of the op at
    machine m rank r (0 for a job's first op); ``JStail[b, m, r]`` = tail
    length THROUGH the job successor, i.e. dur(js) + tail(js) (0 for a
    job's last op). Machine neighbors need no lookup — they are rank shifts.

    Pure layout transforms: rank->job via the inverse permutation
    (argsort of the order rows), job-position shifts for predecessor/
    successor, then back to rank layout. All gathers ride tiny J/M axes
    once per tabu iteration (the sweeps dominate).
    """
    op_machine, op_pos, _ = tables
    B, M, J = orders.shape
    end_rank = starts + dur_rank
    T_rank = dur_rank + tails
    rank_of = jnp.argsort(orders, axis=2)  # inverse permutation (B, M, Jjob)
    E_mj = jnp.take_along_axis(end_rank, rank_of, axis=2)
    T_mj = jnp.take_along_axis(T_rank, rank_of, axis=2)
    om_b = jnp.broadcast_to(
        op_machine if op_machine.ndim == 3 else op_machine[None], (B, J, M)
    )
    op_pos_b = jnp.broadcast_to(
        op_pos if op_pos.ndim == 3 else op_pos[None], (B, J, M)
    )
    # (m, job) -> (job, position): X_jpos[b, j, k] = X_mj[b, om[j, k], j]
    E_jpos = jnp.take_along_axis(jnp.swapaxes(E_mj, 1, 2), om_b, axis=2)
    T_jpos = jnp.take_along_axis(jnp.swapaxes(T_mj, 1, 2), om_b, axis=2)
    zeros1 = jnp.zeros((B, J, 1), starts.dtype)
    JPend_jpos = jnp.concatenate([zeros1, E_jpos[..., :-1]], axis=2)
    JStail_jpos = jnp.concatenate([T_jpos[..., 1:], zeros1], axis=2)
    # (job, position) -> (job, machine) -> rank
    JPend_jm = jnp.take_along_axis(JPend_jpos, op_pos_b, axis=2)
    JStail_jm = jnp.take_along_axis(JStail_jpos, op_pos_b, axis=2)
    JPend = jnp.take_along_axis(jnp.swapaxes(JPend_jm, 1, 2), orders, axis=2)
    JStail = jnp.take_along_axis(jnp.swapaxes(JStail_jm, 1, 2), orders, axis=2)
    return JPend, JStail


def _swap_estimates(tables, orders, starts, tails, dur_rank):
    """(B, M, J) estimated post-swap makespans for EVERY adjacent pair
    (r, r+1): the length of the longest path through the swapped pair,
    computed from the pair's job/machine neighbor heads and tails (Taillard's
    classic accelerated evaluation for the Nowicki-Smutnicki neighborhood).

    Exact whenever the new critical path passes through the pair and the
    neighbors' heads/tails are unaffected by the swap (the common case);
    used for move SELECTION only — the applied move is re-priced by an
    exact sweep, so best-tracking and certification never see an estimate.
    Entries at r = J-1 are meaningless (no pair).
    """
    JPend, JStail = _neighbor_bounds(tables, orders, starts, tails, dur_rank)
    end_rank = starts + dur_rank
    T_rank = dur_rank + tails
    B, M, J = orders.shape
    z1 = jnp.zeros((B, M, 1), starts.dtype)
    MPend = jnp.concatenate([z1, end_rank[..., :-1]], axis=2)  # end of r-1
    MStail = jnp.concatenate(
        [T_rank[..., 2:], z1, z1], axis=2
    )  # T of rank r+2, 0 past the end
    d_u = dur_rank
    d_v = jnp.roll(dur_rank, -1, axis=2)
    JP_v = jnp.roll(JPend, -1, axis=2)
    JS_v = jnp.roll(JStail, -1, axis=2)
    hv = jnp.maximum(JP_v, MPend)  # v first after the swap
    hu = jnp.maximum(JPend, hv + d_v)
    tu = jnp.maximum(JStail, MStail)  # u last after the swap
    tv = jnp.maximum(JS_v, d_u + tu)
    return jnp.maximum(hv + d_v + tv, hu + d_u + tu)


def tabu_search(
    tables,
    orders0: jax.Array,
    seed: jax.Array,
    iters: int = 2000,
    proposals: int = 8,
    tenure_min: int = 8,
    tenure_spread: int = 6,
    neighborhood: str = "sampled",
    guided_temp: float = 4.0,
) -> Tuple[jax.Array, jax.Array]:
    """Refine an order batch by parallel tabu search; returns
    (best_orders (B, M, J), best_makespans (B,)).

    Per chain and iteration: sample ``proposals`` adjacent swaps from the
    critical-pair candidate set (uniform random adjacent pairs when a chain
    has no critical pair), price them all with one batched sweep, and move
    to the best *admissible* proposal — one whose move attribute is not
    tabu, or which improves on the chain's best-so-far (aspiration). If
    every sampled proposal is tabu, the best tabu one is taken (stalling
    beats freezing). The applied move's inverse — re-swapping the same
    ordered job pair on that machine — is forbidden for
    ``tenure_min + U[0, tenure_spread)`` iterations (randomized tenure
    breaks limit cycles; Taillard's classic recipe).

    Device cost per iteration: one (B*proposals)-lane forward sweep plus one
    B-lane reversed sweep (tails), so at equal sweep-lane budget
    ``B_tabu * proposals ~= B_sa`` this costs the same as ``anneal()`` while
    selecting per-iteration moves from a P-wide priced neighborhood instead
    of Metropolis-accepting a single sample. Runs in bounded device-call
    chunks (_CHUNK) like ``anneal()``.

    ``neighborhood="full"`` replaces the P sampled-and-swept proposals with
    Taillard's O(1) path-through-the-pair estimate over the ENTIRE
    critical-pair candidate set (``_swap_estimates``); only the selected
    move is priced exactly (one B-lane sweep). Stronger selection at ~2
    B-lane sweeps per iteration total; ``proposals`` is ignored.

    ``neighborhood="guided"`` is the hybrid: estimate every critical pair
    as in "full", then draw the P exactly-priced proposals by Gumbel-top-P
    over ``-estimate / guided_temp`` instead of uniformly — estimator
    selection pressure plus the sampling noise that breaks "full"-mode's
    limit cycles. ``guided_temp`` (makespan units) sets how sharply the
    draw prefers low estimates.
    """
    if neighborhood not in ("sampled", "full", "guided"):
        raise ValueError(f"bad neighborhood {neighborhood!r}")
    carry = _tabu_init(tables, orders0, seed)
    for i0 in range(0, int(iters), _CHUNK):
        n = min(_CHUNK, int(iters) - i0)
        if neighborhood == "full":
            carry = _tabu_chunk_full(
                tables, carry, jnp.int32(i0), n,
                int(tenure_min), int(tenure_spread),
            )
        else:
            carry = _tabu_chunk(
                tables, carry, jnp.int32(i0), n, int(proposals),
                int(tenure_min), int(tenure_spread),
                float(guided_temp) if neighborhood == "guided" else None,
            )
    _, _, _, (best_orders, best_mk) = carry
    return best_orders, best_mk


@jax.jit
def _tabu_init(tables, orders0, seed):
    mk0, starts0 = _sweep(tables, orders0)
    if tables[0].ndim == 2:
        # shared tables: lanes with infeasible seeds restart from the best
        # feasible lane. With per-lane tables lanes belong to DIFFERENT
        # instances, so borrowing another lane's order would be nonsense —
        # infeasible seeds stay priced INT32_MAX and simply never move
        # (seed orders derived from real schedules are always feasible).
        ref = jnp.argmin(mk0)
        bad = mk0 == _I32_MAX
        orders0 = jnp.where(bad[:, None, None], orders0[ref][None], orders0)
        mk0 = jnp.where(bad, mk0[ref], mk0)
        starts0 = jnp.where(bad[:, None, None], starts0[ref][None], starts0)
    B, M, J = orders0.shape
    rtables = reverse_tables(tables)
    tails0 = _tails(rtables, orders0)
    # tabu_until[b, m*J*J + u*J + v]: swapping adjacent (u before v) on
    # machine m is forbidden while iteration < value. int32 (B, M*J*J) —
    # 18.4MB at B=256/30x20, fine in HBM.
    tabu = jnp.zeros((B, M * J * J), jnp.int32)
    rng = jax.random.key(seed)
    return rng, (orders0, mk0, starts0, tails0), tabu, (orders0, mk0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _tabu_chunk(
    tables, chunk_carry, i0, n, P, tenure_min, tenure_spread,
    guided_temp=None,
):
    rng, cur, tabu, best = chunk_carry
    B, M, J = cur[0].shape
    rtables = reverse_tables(tables)
    j2 = J * J
    # per-lane tables must follow the proposal fan-out: proposal lane b*P+p
    # belongs to chain b, so repeat each table row P times
    tabP = (
        tuple(jnp.repeat(t, P, axis=0) for t in tables)
        if tables[0].ndim == 3
        else tables
    )
    dur_T = (
        tables[2].T[None]
        if tables[2].ndim == 2
        else jnp.swapaxes(tables[2], -1, -2)
    )

    def body(i, carry):
        rng, (orders, mk, starts, tails), tabu, (best_orders, best_mk) = carry
        it = i0 + i
        rng, k_cand, k_rand, k_ten = jax.random.split(rng, 4)
        crit = _critical_ops(tables, orders, mk, starts, tails)
        cand = (crit & jnp.roll(crit, -1, axis=2)).at[:, :, J - 1].set(False)
        if guided_temp is not None:
            # guided sampling (Gumbel-top-P over Taillard estimates): the
            # full-neighborhood estimator prices every critical pair in
            # O(1), but its deterministic argmin limit-cycles (see
            # tabu_search docstring / docs/BENCHMARKS.md). Perturbing the
            # estimate scores with Gumbel noise and taking the top P keeps
            # the estimator's selection pressure while restoring the
            # stochasticity that breaks cycles; the P picks are distinct by
            # construction (uniform sampling draws with replacement).
            dur_rank = jnp.take_along_axis(
                jnp.broadcast_to(dur_T, (B, M, J)), orders, axis=2
            )
            est = _swap_estimates(
                tables, orders, starts, tails, dur_rank
            ).reshape(B, M * J)
            gum = jax.random.gumbel(k_cand, (B, M * J), jnp.float32)
            score = jnp.where(
                cand.reshape(B, M * J),
                -est.astype(jnp.float32) / guided_temp + gum,
                -jnp.inf,
            )
            _, idx = jax.lax.top_k(score, P)  # (B, P) distinct
            idx = idx.astype(jnp.int32)
            has = jnp.take_along_axis(cand.reshape(B, M * J), idx, axis=1)
        else:
            flat = jnp.broadcast_to(cand.reshape(B, 1, M * J), (B, P, M * J))
            idx, has = jax.vmap(_sample_true, in_axes=(0, 1), out_axes=1)(
                jax.random.split(k_cand, P), flat
            )  # (B, P)
        msel_r = jax.random.randint(k_rand, (B, P), 0, M, dtype=jnp.int32)
        p_r = jax.random.randint(k_ten, (B, P), 0, J - 1, dtype=jnp.int32)
        msel = jnp.where(has, idx // J, msel_r)
        p = jnp.where(has, idx % J, p_r)

        # price all B*P proposals with one sweep batch
        ordP = jnp.broadcast_to(orders[:, None], (B, P, M, J)).reshape(
            B * P, M, J
        )
        prop = _swap_adjacent(ordP, msel.reshape(-1), p.reshape(-1))
        mk_p, starts_p = _sweep(tabP, prop)
        mk_p = mk_p.reshape(B, P)

        # move attribute of proposal (u before v -> v before u): flat index
        # msel*J*J + u*J + v; tabu iff tabu[b, attr] > it
        row = jnp.take_along_axis(orders, msel[:, :, None], axis=1)  # (B,P,J)
        u = jnp.take_along_axis(row, p[:, :, None], axis=2)[:, :, 0]
        v = jnp.take_along_axis(row, (p + 1)[:, :, None], axis=2)[:, :, 0]
        attr_fwd = msel * j2 + u * J + v
        attr_inv = msel * j2 + v * J + u
        is_tabu = jnp.take_along_axis(tabu, attr_fwd, axis=1) > it
        feas = mk_p < _I32_MAX
        aspire = mk_p < best_mk[:, None]
        admissible = feas & (~is_tabu | aspire)

        # best admissible, else best feasible (stall rather than corrupt).
        # _I32_MAX is a safe exclusion sentinel: admissible/feasible
        # proposals always have mk < _I32_MAX, so argmin only lands on an
        # excluded slot when the corresponding any() guard is False.
        key_adm = jnp.where(admissible, mk_p, _I32_MAX)
        key_feas = jnp.where(feas, mk_p, _I32_MAX)
        any_adm = jnp.any(admissible, axis=1)
        sel = jnp.where(
            any_adm, jnp.argmin(key_adm, axis=1), jnp.argmin(key_feas, axis=1)
        ).astype(jnp.int32)
        movable = jnp.where(any_adm, True, jnp.any(feas, axis=1))

        sel_oh = sel[:, None] == jnp.arange(P, dtype=jnp.int32)[None, :]
        mk_new = jnp.sum(jnp.where(sel_oh, mk_p, 0), axis=1)
        prop_bp = prop.reshape(B, P, M, J)
        starts_bp = starts_p.reshape(B, P, M, J)
        sel4 = sel_oh[:, :, None, None]
        ord_new = jnp.sum(jnp.where(sel4, prop_bp, 0), axis=1)
        starts_new = jnp.sum(jnp.where(sel4, starts_bp, 0), axis=1)

        mv3 = movable[:, None, None]
        orders = jnp.where(mv3, ord_new, orders)
        mk = jnp.where(movable, mk_new, mk)
        starts = jnp.where(mv3, starts_new, starts)

        # tabu the inverse of the applied move, randomized tenure
        rng, k_jit = jax.random.split(rng)
        tenure = tenure_min + (
            jax.random.randint(k_jit, (B,), 0, max(tenure_spread, 1))
            if tenure_spread > 0
            else 0
        )
        attr_applied = jnp.sum(jnp.where(sel_oh, attr_inv, 0), axis=1)
        new_until = jnp.where(movable, it + 1 + tenure, 0)
        tabu = tabu.at[jnp.arange(B), attr_applied].max(new_until)

        better = mk < best_mk
        best_orders = jnp.where(better[:, None, None], orders, best_orders)
        best_mk = jnp.where(better, mk, best_mk)

        tails = _tails(rtables, orders)
        return rng, (orders, mk, starts, tails), tabu, (best_orders, best_mk)

    rng, cur, tabu, best = jax.lax.fori_loop(
        0, n, body, (rng, cur, tabu, best)
    )
    return rng, cur, tabu, best


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _tabu_chunk_full(tables, chunk_carry, i0, n, tenure_min, tenure_spread):
    """Full-neighborhood tabu iteration (see tabu_search docstring):
    estimate EVERY critical-pair swap in O(1) each, pick the best
    admissible, price only the applied move exactly."""
    rng, cur, tabu, best = chunk_carry
    B, M, J = cur[0].shape
    rtables = reverse_tables(tables)
    j2 = J * J
    dur_T = (
        tables[2].T[None]
        if tables[2].ndim == 2
        else jnp.swapaxes(tables[2], -1, -2)
    )

    def body(i, carry):
        rng, (orders, mk, starts, tails), tabu, (best_orders, best_mk) = carry
        it = i0 + i
        rng, k_rand, k_jit = jax.random.split(rng, 3)

        dur_rank = jnp.take_along_axis(
            jnp.broadcast_to(dur_T, (B, M, J)), orders, axis=2
        )
        est = _swap_estimates(tables, orders, starts, tails, dur_rank)
        crit = _critical_ops(tables, orders, mk, starts, tails)
        cand = (crit & jnp.roll(crit, -1, axis=2)).at[:, :, J - 1].set(False)

        # tabu status of every pair: attribute (m, u_job, v_job)
        u_j = orders
        v_j = jnp.roll(orders, -1, axis=2)
        m_iota = jnp.arange(M, dtype=jnp.int32)[None, :, None]
        attr_fwd = (m_iota * j2 + u_j * J + v_j).reshape(B, M * J)
        is_tabu = (
            jnp.take_along_axis(tabu, attr_fwd, axis=1).reshape(B, M, J) > it
        )
        aspire = est < best_mk[:, None, None]
        admissible = cand & (~is_tabu | aspire)

        flat_adm = jnp.where(admissible, est, _I32_MAX).reshape(B, M * J)
        flat_cand = jnp.where(cand, est, _I32_MAX).reshape(B, M * J)
        any_adm = jnp.any(admissible, axis=(1, 2))
        has_cand = jnp.any(cand, axis=(1, 2))
        pick = jnp.where(
            any_adm,
            jnp.argmin(flat_adm, axis=1),
            jnp.argmin(flat_cand, axis=1),  # all-tabu: least-bad estimate
        ).astype(jnp.int32)
        # no critical pair at all (already-optimal-ish lane): random pair
        msel_r = jax.random.randint(k_rand, (B,), 0, M, dtype=jnp.int32)
        p_r = jax.random.randint(k_jit, (B,), 0, J - 1, dtype=jnp.int32)
        msel = jnp.where(has_cand, pick // J, msel_r)
        p = jnp.where(has_cand, pick % J, p_r)

        prop = _swap_adjacent(orders, msel, p)
        mk_p, starts_p = _sweep(tables, prop)  # exact pricing, applied move
        movable = mk_p < _I32_MAX  # random fallback swaps may be infeasible
        mv3 = movable[:, None, None]

        # tabu the inverse move (jobs read from the PRE-swap orders)
        rng, k_ten = jax.random.split(rng)
        row = jnp.take_along_axis(orders, msel[:, None, None], axis=1)[:, 0, :]
        u = jnp.take_along_axis(row, p[:, None], axis=1)[:, 0]
        v = jnp.take_along_axis(row, (p + 1)[:, None], axis=1)[:, 0]
        attr_inv = msel * j2 + v * J + u
        tenure = tenure_min + (
            jax.random.randint(k_ten, (B,), 0, max(tenure_spread, 1))
            if tenure_spread > 0
            else 0
        )
        new_until = jnp.where(movable, it + 1 + tenure, 0)
        tabu = tabu.at[jnp.arange(B), attr_inv].max(new_until)

        orders = jnp.where(mv3, prop, orders)
        mk = jnp.where(movable, mk_p, mk)
        starts = jnp.where(mv3, starts_p, starts)
        better = mk < best_mk
        best_orders = jnp.where(better[:, None, None], orders, best_orders)
        best_mk = jnp.where(better, mk, best_mk)
        tails = _tails(rtables, orders)
        return rng, (orders, mk, starts, tails), tabu, (best_orders, best_mk)

    rng, cur, tabu, best = jax.lax.fori_loop(
        0, n, body, (rng, cur, tabu, best)
    )
    return rng, cur, tabu, best
