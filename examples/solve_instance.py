#!/usr/bin/env python
"""Solve a JSSP instance on device and render the schedule.

Beyond-reference capability demo: the reference environment only *simulates*
schedules chosen by an agent; this framework also ships an on-device solver
(jssenv_tpu.solve) — thousands of noisy dispatching rollouts in lockstep,
refined by critical-path simulated annealing in schedule space, certified by
exact replay.

Usage:
    python examples/solve_instance.py [ta41] [--batch 1024] [--sweeps 4]
        [--refine 3000] [--seed 0] [--gantt out.png]

Prints the best certified makespan (and the gap when the optimum is known).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# best-known makespans for the instances the reference's golden tests cover
# (reference tests/test_solutions.py assertions; see BASELINE.md). ta01/ta51
# are proven optima; the 30x20 ta41-ta50 values are published upper bounds
# (several of those instances remain open), so a negative gap is possible.
BEST_KNOWN = {
    "ta01": 1231, "ta41": 2006, "ta42": 1939, "ta43": 1846, "ta44": 1979,
    "ta45": 2000, "ta46": 2006, "ta47": 1889, "ta48": 1937, "ta49": 1963,
    "ta50": 1923, "ta51": 2760,
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("instance", nargs="?", default="ta41",
                   help="bundled instance name or Taillard file path")
    p.add_argument("--batch", type=int, default=1024,
                   help="parallel search lanes on device")
    p.add_argument("--sweeps", type=int, default=4,
                   help="rollout episodes per lane in the first stage")
    p.add_argument("--refine", type=int, default=3000,
                   help="annealing iterations in the second stage (0 = off)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--anneal-t0", type=float, default=0.08,
                   help="annealing start temperature (fraction of seed "
                        "makespan); big-budget 30x20 runs do ~2.5%% better "
                        "at 0.015 (docs/BENCHMARKS.md)")
    p.add_argument("--anneal-t1", type=float, default=0.004,
                   help="annealing end temperature fraction (0.001 for "
                        "big-budget 30x20 runs)")
    p.add_argument("--method", choices=["anneal", "tabu"], default="tabu",
                   help="refinement engine; tabu (default) reached 5.7%% on "
                        "ta41 at 50k iters vs anneal's 10%% at equal budget "
                        "(docs/BENCHMARKS.md round-5 solver notes)")
    p.add_argument("--chains", type=int, default=128,
                   help="tabu chains (seeded from the top-K distinct "
                        "rollout schedules)")
    p.add_argument("--proposals", type=int, default=8,
                   help="sampled critical-pair proposals per tabu iteration")
    p.add_argument("--neighborhood", choices=["sampled", "full"],
                   default="sampled",
                   help="tabu move selection: P sampled swept proposals, or "
                        "the full candidate set via O(1) path estimates")
    p.add_argument("--gantt", default=None,
                   help="save a Gantt chart of the best schedule to this path")
    args = p.parse_args()

    from jssenv_tpu import instances, solve

    spec = instances.get_instance(args.instance)
    print(f"{spec.name}: {spec.num_jobs} jobs x {spec.num_machines} machines, "
          f"batch={args.batch} sweeps={args.sweeps} refine={args.refine}")

    t0 = time.time()
    res = solve.solve(
        spec,
        batch=args.batch,
        sweeps=args.sweeps,
        seed=args.seed,
        refine_iters=args.refine,
        anneal_t0=args.anneal_t0,
        anneal_t1=args.anneal_t1,
        refine_method=args.method,
        tabu_chains=args.chains,
        tabu_proposals=args.proposals,
        tabu_neighborhood=args.neighborhood,
    )
    dt = time.time() - t0

    line = f"best certified makespan: {res.makespan}  ({res.episodes} episodes searched, {dt:.1f}s)"
    if res.timings:
        line += f"  stages={res.timings}"
    opt = BEST_KNOWN.get(spec.name)
    if opt is not None:
        line += f"  [best known {opt}, gap {100.0 * (res.makespan - opt) / opt:.2f}%]"
    print(line)

    if args.gantt:
        from jssenv_tpu.render import gantt

        fig = gantt.render_schedule(
            res.solution, res.op_machine, spec.op_dur, backend="matplotlib"
        )
        fig.savefig(args.gantt, dpi=120, bbox_inches="tight")
        print(f"Gantt saved to {args.gantt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
