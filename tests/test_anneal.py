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
