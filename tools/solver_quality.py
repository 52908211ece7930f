#!/usr/bin/env python
"""Reproducible solver-quality sweeps -> docs/solver_quality*.json.

Round-4's quality numbers came from ad-hoc driver scripts; this tool commits
the methodology (VERDICT r4 items 2/6):

* compile isolation: a tiny-budget warmup solve runs first and its wall time
  is recorded as ``compile_s`` — per-row timings then measure SEARCH, not
  XLA compilation (round-3/4 rows folded 100-1000s of compile into whichever
  row ran first);
* seed discipline: every row reports the seed-0 result AND the best over
  ``--seeds``; the summary carries both means (``mean_gap_seed0`` is the
  honest single-run number, ``mean_gap`` the best-of-seeds one);
* gap anchoring: rows carry ``gap_pct`` vs the published best-known where
  bundled and ``gap_vs_lb_pct`` vs the certified instance lower bound
  (InstanceSpec.lower_bound) everywhere.

Usage:
  python tools/solver_quality.py --family 30x20 --method tabu \
      --iters 12000 --seeds 0 1 2 --out docs/solver_quality_30x20.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FAMILIES = {
    "15x15": [f"ta{i:02d}" for i in range(1, 11)],
    "30x20": [f"ta{i}" for i in range(41, 51)],
    "dmu": [f"dmu{i}" for i in range(16, 21)],
}

# published best-known makespans (reference golden tests + literature values
# for the 15x15 family already used by docs/solver_quality.json)
BEST_KNOWN = {
    "ta01": 1231, "ta02": 1244, "ta03": 1218, "ta04": 1175, "ta05": 1224,
    "ta06": 1238, "ta07": 1227, "ta08": 1217, "ta09": 1274, "ta10": 1241,
    "ta41": 2006, "ta42": 1939, "ta43": 1846, "ta44": 1979, "ta45": 2000,
    "ta46": 2006, "ta47": 1889, "ta48": 1937, "ta49": 1963, "ta50": 1923,
    "ta51": 2760,
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=sorted(FAMILIES), default="30x20")
    p.add_argument("--instances", nargs="*", default=None,
                   help="explicit instance list (overrides --family)")
    p.add_argument("--method", choices=["anneal", "tabu"], default="tabu")
    p.add_argument("--iters", type=int, default=12000)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sweeps", type=int, default=3)
    p.add_argument("--chains", type=int, default=128)
    p.add_argument("--proposals", type=int, default=8)
    p.add_argument("--neighborhood", choices=["sampled", "full", "guided"],
                   default="sampled")
    p.add_argument("--guided-temp", type=float, default=4.0)
    p.add_argument("--anneal-t0", type=float, default=0.015)
    p.add_argument("--anneal-t1", type=float, default=0.001)
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--out", default=None, help="write JSON here (else stdout)")
    args = p.parse_args()

    from jssenv_tpu import instances as inst, solve

    names = args.instances or FAMILIES[args.family]

    def run(name, seed, iters):
        spec = inst.get_instance(name)
        t0 = time.time()
        res = solve.solve(
            spec, batch=args.batch, sweeps=args.sweeps, seed=seed,
            refine_iters=iters, refine_method=args.method,
            anneal_t0=args.anneal_t0, anneal_t1=args.anneal_t1,
            tabu_chains=args.chains, tabu_proposals=args.proposals,
            tabu_neighborhood=args.neighborhood,
            tabu_guided_temp=args.guided_temp,
        )
        return res, time.time() - t0

    # compile isolation: tiny-budget warmup on the first instance
    t0 = time.time()
    run(names[0], seed=max(args.seeds) + 1, iters=64)
    compile_s = round(time.time() - t0, 1)
    print(f"warmup/compile: {compile_s}s", file=sys.stderr, flush=True)

    rows = []
    for name in names:
        spec = inst.get_instance(name)
        lb = spec.lower_bound()
        per_seed = {}
        secs = {}
        timings0 = None
        for seed in args.seeds:
            res, dt = run(name, seed, args.iters)
            per_seed[seed] = res.makespan
            secs[seed] = round(dt, 1)
            if seed == args.seeds[0]:
                timings0 = res.timings
            print(f"{name} seed {seed}: {res.makespan} ({dt:.0f}s)",
                  file=sys.stderr, flush=True)
        mk0 = per_seed[0] if 0 in per_seed else per_seed[args.seeds[0]]
        best = min(per_seed.values())
        row = {
            "instance": name,
            "makespan_seed0": mk0,
            "makespan": best,
            "seeds_run": list(per_seed),
            "seconds_per_seed": secs,
            "lower_bound": lb,
            "gap_vs_lb_pct": round(100.0 * (best - lb) / lb, 2),
            "gap_vs_lb_seed0_pct": round(100.0 * (mk0 - lb) / lb, 2),
        }
        if timings0:
            row["timings_seed0"] = timings0
        bk = BEST_KNOWN.get(name)
        if bk:
            row["best_known"] = bk
            row["gap_pct"] = round(100.0 * (best - bk) / bk, 2)
            row["gap_seed0_pct"] = round(100.0 * (mk0 - bk) / bk, 2)
        rows.append(row)

    def mean(key):
        vals = [r[key] for r in rows if key in r]
        return round(sum(vals) / len(vals), 2) if vals else None

    out = {
        "rows": rows,
        "config": (
            f"method={args.method} batch={args.batch} sweeps={args.sweeps} "
            f"iters={args.iters} chains={args.chains} "
            f"proposals={args.proposals} neighborhood={args.neighborhood} "
            f"t={args.anneal_t0}/{args.anneal_t1} seeds={args.seeds}"
        ),
        "compile_s": compile_s,
        "mean_gap": mean("gap_pct"),
        "max_gap": max((r["gap_pct"] for r in rows if "gap_pct" in r),
                       default=None),
        "mean_gap_seed0": mean("gap_seed0_pct"),
        "mean_gap_vs_lb": mean("gap_vs_lb_pct"),
    }
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.out}", file=sys.stderr)
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
