"""On-device solver: quality, and round-trip replay of the found schedule."""

import numpy as np

from jssenv_tpu import instances as inst, replay, solve
from jssenv_tpu.rules.dispatching import compare_rules_batched


def test_solve_beats_or_matches_greedy_rules():
    spec = inst.get_instance("ta01")
    res = solve.solve(spec, batch=64, sweeps=2, temperature=0.7, seed=0)
    greedy = compare_rules_batched(spec, num_episodes=1, explore_prob=0.0)
    best_rule = min(v["avg_makespan"] for v in greedy.values())
    assert res.makespan <= best_rule
    assert res.episodes >= 64  # every lane finished at least one episode
    # a valid complete schedule: every op has a start time
    assert res.solution.min() >= 0
    assert res.solution.shape == (15, 15)


def test_solve_zero_temperature_equals_best_portfolio_rule():
    spec = inst.get_instance("ta01")
    res = solve.solve(spec, batch=8, sweeps=1, temperature=0.0, num_rules=5, seed=1)
    greedy = compare_rules_batched(spec, num_episodes=1, explore_prob=0.0)
    best_rule = min(
        greedy[name]["avg_makespan"] for name in ("SPT", "MWR", "MOR", "FIFO", "CR")
    )
    assert res.makespan == int(best_rule)


def test_solution_replays_to_claimed_makespan():
    spec = inst.get_instance("ta01")
    res = solve.solve(spec, batch=32, sweeps=2, temperature=0.7, seed=2)
    makespan, state = replay.replay_machine_order(spec, res.machine_order())
    assert makespan == res.makespan
    # the replayed schedule's start times match the solver's artifact
    sol = np.asarray(state.solution)[: spec.num_jobs, : spec.num_machines]
    assert (sol == res.solution).all()


def test_solve_with_refine_gap_bound_ta01():
    """Fixed-seed regression: solve + critical-path annealing must land
    within 8% of the ta01 optimum (1231). TPU runs land ~4-5%; this bound
    holds for the reduced CPU-test budget too."""
    spec = inst.get_instance("ta01")
    res = solve.solve(spec, batch=256, sweeps=2, seed=0, refine_iters=600)
    assert res.makespan <= 1231 * 1.08
    makespan, _ = replay.replay_machine_order(spec, res.machine_order())
    assert makespan == res.makespan
