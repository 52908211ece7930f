"""Schedule-space annealer: golden anchor, feasibility, and refinement."""

import json
import os

import jax.numpy as jnp
import numpy as np

from jssenv_tpu import anneal, instances as inst, replay, solve
from jssenv_tpu.core import engine

_DATA = os.path.join(os.path.dirname(__file__), "data", "golden_solutions.json")
with open(_DATA) as f:
    GOLDEN = json.load(f)


def _tables(name):
    state = engine.state_from_spec(inst.get_instance(name))
    return state, anneal.schedule_tables(state.op_machine, state.op_dur, state.op_pos)


def test_evaluator_reproduces_published_optima():
    """The DAG longest path of a published-optimal order IS its optimum."""
    for name in ("ta01", "ta41", "ta51"):
        state, tables = _tables(name)
        orders = jnp.asarray(np.array(GOLDEN[name]["machine_order"], np.int32))[None]
        assert int(anneal.evaluate_orders(tables, orders)[0]) == GOLDEN[name]["optimum"]


def test_evaluator_flags_infeasible_orders():
    state, tables = _tables("ta01")
    order = np.array(GOLDEN["ta01"]["machine_order"], np.int32)
    bad = order.copy()
    bad[0] = bad[0][::-1]  # reversing one machine's order creates cycles
    mks = anneal.evaluate_orders(tables, jnp.stack([jnp.asarray(order), jnp.asarray(bad)]))
    assert int(mks[0]) == 1231
    assert int(mks[1]) == np.iinfo(np.int32).max


def test_anneal_from_optimum_stays_at_optimum():
    state, tables = _tables("ta01")
    orders = jnp.repeat(
        jnp.asarray(np.array(GOLDEN["ta01"]["machine_order"], np.int32))[None], 4, 0
    )
    _, best = anneal.anneal(tables, orders, jnp.uint32(0), 100)
    assert (np.asarray(best) == 1231).all()


def test_anneal_improves_rule_schedules_and_certifies():
    """End-to-end: rollout search + annealing refinement, certified replay."""
    spec = inst.get_instance("ta01")
    base = solve.solve(spec, batch=32, sweeps=2, temperature=0.7, seed=5)
    refined = solve.solve(
        spec, batch=32, sweeps=2, temperature=0.7, seed=5, refine_iters=400
    )
    assert refined.makespan <= base.makespan
    # returned artifact is certified: replay reproduces the makespan
    mk, _ = replay.replay_machine_order(spec, refined.machine_order())
    assert mk == refined.makespan


def test_tabu_from_optimum_stays_at_optimum():
    """Tabu moves are uphill-capable but best-so-far tracking must hold the
    optimum once seeded with it."""
    state, tables = _tables("ta01")
    orders = jnp.repeat(
        jnp.asarray(np.array(GOLDEN["ta01"]["machine_order"], np.int32))[None], 4, 0
    )
    _, best = anneal.tabu_search(tables, orders, jnp.uint32(0), 60, proposals=4)
    assert (np.asarray(best) == 1231).all()


def test_tabu_improves_and_certifies():
    """solve(refine_method='tabu'): improves on the raw rollout result and
    the returned artifact replays to its claimed makespan."""
    spec = inst.random_instance(10, 6, duration_range=(1, 30), seed=7)
    base = solve.solve(spec, batch=64, sweeps=2, seed=3)
    refined = solve.solve(
        spec, batch=64, sweeps=2, seed=3, refine_iters=150,
        refine_method="tabu", tabu_chains=16, tabu_proposals=4,
    )
    assert refined.makespan <= base.makespan
    mk, _ = replay.replay_machine_order(spec, refined.machine_order())
    assert mk == refined.makespan


def test_top_k_distinct_orders_dedups_and_ranks():
    state, tables = _tables("ta01")
    opt = np.array(GOLDEN["ta01"]["machine_order"], np.int32)
    worse = opt.copy()
    worse[0] = np.roll(worse[0], 1)  # different (maybe infeasible) order
    orders = jnp.asarray(np.stack([opt, opt, worse, opt]))
    mks = anneal.evaluate_orders(tables, orders)
    seeds = solve.top_k_distinct_orders(orders, mks, 4)
    host = np.asarray(seeds)
    # duplicates of the optimum collapse to ONE distinct entry; the set
    # tiles round-robin over the distinct survivors, best first
    assert (host[0] == opt).all()
    n_distinct = len({host[i].tobytes() for i in range(4)})
    assert n_distinct <= 2 and host.shape == (4,) + opt.shape
    mks2 = np.asarray(anneal.evaluate_orders(tables, seeds))
    assert (mks2 < np.iinfo(np.int32).max).all()  # infeasible never seeds


def test_noncritical_adjacent_swaps_never_improve():
    """The theorem behind the move set (anneal.critical_pairs): an adjacent
    swap on a machine can only reduce the makespan if BOTH ops are critical.
    Exhaustively enumerate every adjacent swap on small random instances."""
    import jax

    for seed in range(3):
        spec = inst.random_instance(5, 4, seed=seed)
        state = engine.state_from_spec(spec)
        tables = anneal.schedule_tables(state.op_machine, state.op_dur, state.op_pos)
        rtables = anneal.reverse_tables(tables)
        J, M = 5, 4
        # a feasible seed order: jobs in index order on every machine
        orders = jnp.broadcast_to(jnp.arange(J, dtype=jnp.int32), (1, M, J))
        mk, starts = anneal._sweep(tables, orders)
        assert int(mk[0]) < np.iinfo(np.int32).max
        cand = np.asarray(anneal.critical_pairs(tables, rtables, orders, mk, starts))[0]
        # criticality definition check: head + dur + tail == mk elementwise
        _, starts_rev = anneal._sweep(rtables, jnp.flip(orders, axis=2))
        tails = np.asarray(jnp.flip(starts_rev, axis=2))[0]
        dur_rank = np.asarray(
            jnp.take_along_axis(
                jnp.broadcast_to(tables[2].T, (1, M, J)), orders, axis=2
            )
        )[0]
        crit = (np.asarray(starts)[0] + dur_rank + tails) == int(mk[0])
        assert crit.any(), "some op is always critical"
        # enumerate every adjacent swap; improvements must be critical pairs
        props, where = [], []
        for m in range(M):
            for r in range(J - 1):
                props.append(
                    anneal._swap_adjacent(
                        orders, jnp.asarray([m], jnp.int32), jnp.asarray([r], jnp.int32)
                    )[0]
                )
                where.append((m, r))
        mks = np.asarray(anneal.evaluate_orders(tables, jnp.stack(props)))
        for (m, r), mk_p in zip(where, mks):
            if mk_p < int(mk[0]):
                assert crit[m, r] and crit[m, r + 1], (
                    f"non-critical swap ({m},{r}) improved {int(mk[0])}->{mk_p}"
                )
        # and the candidate set is exactly the both-critical adjacent pairs
        expect = crit[:, :-1] & crit[:, 1:]
        assert (cand[:, :-1] == expect).all() and not cand[:, -1].any()


def test_batched_tables_match_shared_tables():
    """Per-lane (B, J, M) tables: evaluating lanes of DIFFERENT instances in
    one sweep must equal per-instance evaluation with shared tables — for
    the evaluator, criticality, SA, and tabu entry points."""
    import jax

    names = ["ta01", "ta02", "ta03"]
    shared = {}
    orders = {}
    for name in names:
        state, tables = _tables(name)
        shared[name] = tables
        sol = solve.solve(inst.get_instance(name), batch=16, sweeps=1, seed=1)
        om = jnp.asarray(state.op_machine, jnp.int32)
        orders[name] = anneal.orders_from_solutions(
            jnp.asarray(state.op_pos, jnp.int32),
            jnp.asarray(np.stack([sol.solution, sol.solution])),
        )

    # stack: 2 lanes per instance, 6 lanes total
    stacked_orders = jnp.concatenate([orders[n] for n in names])
    stack = lambda i: jnp.concatenate(
        [jnp.repeat(shared[n][i][None], 2, axis=0) for n in names]
    )
    btables = (stack(0), stack(1), stack(2))

    mk_b = np.asarray(anneal.evaluate_orders(btables, stacked_orders))
    for k, name in enumerate(names):
        mk_s = np.asarray(anneal.evaluate_orders(shared[name], orders[name]))
        np.testing.assert_array_equal(mk_b[2 * k : 2 * k + 2], mk_s)

    # critical pairs agree lane-for-lane
    for k, name in enumerate(names):
        mk, starts = anneal._sweep(shared[name], orders[name])
        cp_s = np.asarray(anneal.critical_pairs(
            shared[name], anneal.reverse_tables(shared[name]),
            orders[name], mk, starts,
        ))
        mk2, starts2 = anneal._sweep(btables, stacked_orders)
        cp_b = np.asarray(anneal.critical_pairs(
            btables, anneal.reverse_tables(btables),
            stacked_orders, mk2, starts2,
        ))[2 * k : 2 * k + 2]
        np.testing.assert_array_equal(cp_b, cp_s)

    # tabu over the mixed batch improves (or holds) every instance and the
    # per-instance bests replay-certify
    bo, bmk = anneal.tabu_search(btables, stacked_orders, 3, iters=60,
                                 proposals=4)
    bmk = np.asarray(bmk)
    for k, name in enumerate(names):
        lanes = slice(2 * k, 2 * k + 2)
        assert bmk[lanes].min() <= np.asarray(
            anneal.evaluate_orders(shared[name], orders[name])
        ).min()
        lane = 2 * k + int(np.argmin(bmk[lanes]))
        mk_cert, _ = replay.replay_machine_order(
            inst.get_instance(name), np.asarray(bo[lane]).tolist(),
            backend="auto",
        )
        assert mk_cert == int(bmk[lane])


def test_neighbor_bounds_match_bruteforce():
    """JPend/JStail rank layouts (the O(1) swap estimator's inputs) vs a
    direct numpy recomputation from the schedule and instance data."""
    for seed in (0, 1):
        spec = inst.random_instance(6, 5, duration_range=(1, 20), seed=seed)
        state = engine.state_from_spec(spec)
        tables = anneal.schedule_tables(
            state.op_machine, state.op_dur, state.op_pos
        )
        sol = solve.solve(spec, batch=8, sweeps=1, seed=seed)
        orders = anneal.orders_from_solutions(
            jnp.asarray(state.op_pos, jnp.int32),
            jnp.asarray(sol.solution)[None],
        )
        mk, starts = anneal._sweep(tables, orders)
        tails = anneal._tails(anneal.reverse_tables(tables), orders)
        J, M = spec.num_jobs, spec.num_machines
        om = np.asarray(spec.op_machine)
        od = np.asarray(spec.op_dur)
        orders_h = np.asarray(orders)[0]
        starts_h = np.asarray(starts)[0]
        tails_h = np.asarray(tails)[0]
        dur_T = np.asarray(tables[2]).T  # (M, J) dur of job j on machine m
        dur_rank = np.take_along_axis(
            np.broadcast_to(dur_T, (M, J)), orders_h, axis=1
        )
        JP, JS = anneal._neighbor_bounds(
            tables, orders, starts, tails, jnp.asarray(dur_rank)[None]
        )
        JP, JS = np.asarray(JP)[0], np.asarray(JS)[0]

        # brute force per (machine, rank)
        # start of job j's op on machine m:
        start_jm = np.zeros((J, M), np.int64)
        for m in range(M):
            for r in range(J):
                start_jm[orders_h[m, r], m] = starts_h[m, r]
        tail_jm = np.zeros((J, M), np.int64)
        for m in range(M):
            for r in range(J):
                tail_jm[orders_h[m, r], m] = tails_h[m, r]
        for m in range(M):
            for r in range(J):
                j = orders_h[m, r]
                k = int(np.where(om[j] == m)[0][0])
                if k == 0:
                    exp_jp = 0
                else:
                    pm = om[j][k - 1]
                    exp_jp = start_jm[j, pm] + od[j][k - 1]
                assert JP[m, r] == exp_jp, (m, r, JP[m, r], exp_jp)
                if k == M - 1:
                    exp_js = 0
                else:
                    sm = om[j][k + 1]
                    exp_js = tail_jm[j, sm] + od[j][k + 1]
                assert JS[m, r] == exp_js, (m, r, JS[m, r], exp_js)


def test_tabu_full_neighborhood_improves_and_is_exact_on_best():
    """neighborhood='full': best_mk is always the EXACT makespan of
    best_orders (estimates only steer selection), and holds the optimum."""
    state, tables = _tables("ta01")
    opt_orders = jnp.repeat(
        jnp.asarray(np.array(GOLDEN["ta01"]["machine_order"], np.int32))[None],
        4, 0,
    )
    _, best = anneal.tabu_search(
        tables, opt_orders, jnp.uint32(0), 60, neighborhood="full"
    )
    assert (np.asarray(best) == 1231).all()

    spec = inst.random_instance(10, 6, duration_range=(1, 30), seed=11)
    st = engine.state_from_spec(spec)
    tb = anneal.schedule_tables(st.op_machine, st.op_dur, st.op_pos)
    sol = solve.solve(spec, batch=32, sweeps=2, seed=2)
    orders0 = anneal.orders_from_solutions(
        jnp.asarray(st.op_pos, jnp.int32),
        jnp.repeat(jnp.asarray(sol.solution)[None], 8, 0),
    )
    bo, bmk = anneal.tabu_search(tb, orders0, 5, iters=120,
                                 neighborhood="full")
    assert int(jnp.min(bmk)) <= sol.makespan
    np.testing.assert_array_equal(
        np.asarray(anneal.evaluate_orders(tb, bo)), np.asarray(bmk)
    )


def test_tabu_guided_improves_and_is_exact_on_best():
    """neighborhood='guided' (Gumbel-top-P over Taillard estimates): holds
    a seeded optimum, improves rollout schedules, and best_mk is always the
    EXACT makespan of best_orders (estimates only steer the proposal draw —
    every applied move is priced by a real sweep)."""
    state, tables = _tables("ta01")
    opt_orders = jnp.repeat(
        jnp.asarray(np.array(GOLDEN["ta01"]["machine_order"], np.int32))[None],
        4, 0,
    )
    _, best = anneal.tabu_search(
        tables, opt_orders, jnp.uint32(0), 60, proposals=4,
        neighborhood="guided",
    )
    assert (np.asarray(best) == 1231).all()

    spec = inst.random_instance(10, 6, duration_range=(1, 30), seed=11)
    st = engine.state_from_spec(spec)
    tb = anneal.schedule_tables(st.op_machine, st.op_dur, st.op_pos)
    sol = solve.solve(spec, batch=32, sweeps=2, seed=2)
    orders0 = anneal.orders_from_solutions(
        jnp.asarray(st.op_pos, jnp.int32),
        jnp.repeat(jnp.asarray(sol.solution)[None], 8, 0),
    )
    bo, bmk = anneal.tabu_search(tb, orders0, 5, iters=120, proposals=4,
                                 neighborhood="guided")
    assert int(jnp.min(bmk)) <= sol.makespan
    np.testing.assert_array_equal(
        np.asarray(anneal.evaluate_orders(tb, bo)), np.asarray(bmk)
    )
