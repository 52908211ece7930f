"""Distill the bundled 30x20 published-optimal schedules into a policy.

VERDICT r4 item 9 asked for a solver->policy bridge with the concrete bar
"greedy <= 2300 on ta41" (the best from-scratch RL checkpoint sits at 2415,
best greedy rule 2499, solver 2121, published optimum 2006). The bundled
golden table (tests/data/golden_solutions.json) carries published-OPTIMAL
machine orders for ALL TEN of ta41-ta50 — a 6,000-decision teacher set,
strictly better than solver schedules. Pipeline (jssenv_tpu.distill):

  1. collect: replay each optimum through the exact engine, recording every
     (rich_obs, action_mask, allocated job) pair — CPU-friendly, the engine
     is bit-exact across backends.
  2. pretrain: cross-entropy imitation on the pooled pairs (perjob arch —
     one checkpoint runs any (J, M)).
  3. finetune: staged REINFORCE (full-episode unroll 640) on ta41 with a
     small learning rate so on-policy visitation correction doesn't wipe
     the imitation prior.

Usage:
  JAX_PLATFORMS=cpu python tools/distill_30x20.py collect   # -> pairs npz
  python tools/distill_30x20.py pretrain                    # -> pretrain ckpt
  python tools/distill_30x20.py finetune                    # -> final ckpt
  python tools/distill_30x20.py eval <ckpt>                 # table vs rules
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jssenv_tpu import checkpoint, distill, instances as inst, vector
from jssenv_tpu.parallel import learner

ROOT = os.path.join(os.path.dirname(__file__), "..")
GOLDEN = os.path.join(ROOT, "tests", "data", "golden_solutions.json")
PAIRS = os.path.join(ROOT, "models_data", "distill_30x20_pairs.npz")
PRE = os.path.join(ROOT, "models_data", "ta41_distill_pre.npz")
FINAL = os.path.join(ROOT, "models_data", "ta41_distill.npz")
NAMES = [f"ta{n}" for n in range(41, 51)]

CFG = learner.LearnerConfig(
    hidden=(128, 128), arch="perjob", features="rich",
    unroll_steps=640, loss_chunks=8,
)


def collect():
    golden = json.load(open(GOLDEN))
    sets = []
    for name in NAMES:
        spec = inst.get_instance(name)
        t0 = time.time()
        pairs = distill.collect_teacher_pairs(
            spec, golden[name]["machine_order"], CFG
        )
        assert pairs["makespan"] == golden[name]["optimum"], name
        print(f"{name}: {pairs['obs'].shape[0]} pairs, makespan "
              f"{pairs['makespan']} (= published optimum), "
              f"{time.time() - t0:.1f}s", flush=True)
        sets.append(pairs)
    merged = distill.merge_pairs(sets)
    np.savez_compressed(PAIRS, **merged)
    print(f"saved {merged['obs'].shape[0]} pairs -> {PAIRS}")


def template_params(rng=0):
    env = vector.make_batch(inst.get_instance("ta41"), 2)
    return learner.init_train_state(jax.random.key(rng), env, CFG).params


def pretrain(epochs=300, batch_size=512, lr=1e-3):
    d = np.load(PAIRS)
    pairs = {k: d[k] for k in ("obs", "mask", "valid", "action")}
    env = vector.make_batch(inst.get_instance("ta41"), 2)
    t0 = time.time()
    params = distill.pretrain(
        jax.random.key(0), pairs, env, CFG, epochs=epochs,
        batch_size=batch_size, learning_rate=lr, log_fn=print,
    )
    print(f"pretrain {time.time() - t0:.1f}s")
    checkpoint.save(PRE, params)
    for name in ("ta41", "ta45", "ta49"):
        r = learner.evaluate_policy(params, inst.get_instance(name), CFG)
        print(f"{name}: greedy {r['greedy_makespan']}", flush=True)


AUG_ORDERS = os.path.join(ROOT, "models_data", "distill_ta41_aug.json")
PAIRS41 = os.path.join(ROOT, "models_data", "distill_ta41_pairs.npz")


def augment_solve(seeds=(1, 2, 3), iters=12000):
    """Solve ta41 at several seeds (chip) and save the DISTINCT refined
    machine orders — extra teachers for visitation coverage around the
    optimum (the single optimal trajectory only shows 600 states; greedy
    play compounds errors in states it never saw)."""
    from jssenv_tpu import solve

    spec = inst.get_instance("ta41")
    golden = json.load(open(GOLDEN))
    seen = {tuple(np.asarray(golden["ta41"]["machine_order"]).ravel())}
    out = []
    for seed in seeds:
        t0 = time.time()
        res = solve.solve(spec, batch=1024, sweeps=3, seed=seed,
                          refine_iters=iters, refine_method="tabu")
        order = res.machine_order()
        key = tuple(np.asarray(order).ravel())
        if key in seen:
            print(f"seed {seed}: duplicate schedule, skipped")
            continue
        seen.add(key)
        out.append({"seed": seed, "makespan": res.makespan,
                    "machine_order": order})
        print(f"seed {seed}: makespan {res.makespan} "
              f"({time.time() - t0:.1f}s)", flush=True)
    json.dump(out, open(AUG_ORDERS, "w"))
    print(f"saved {len(out)} orders -> {AUG_ORDERS}")


def augment_collect():
    """Collect pairs from the augmentation orders (CPU): merge into the
    all-instance pairs npz AND write a ta41-only pairs file (the anchored
    fine-tune's CE anchor set)."""
    golden = json.load(open(GOLDEN))
    sets = [dict(np.load(PAIRS))]
    spec = inst.get_instance("ta41")
    p41 = [distill.collect_teacher_pairs(
        spec, golden["ta41"]["machine_order"], CFG)]
    for rec in json.load(open(AUG_ORDERS)):
        pairs = distill.collect_teacher_pairs(
            spec, rec["machine_order"], CFG
        )
        assert pairs["makespan"] == rec["makespan"]
        print(f"seed {rec['seed']}: {pairs['obs'].shape[0]} pairs at "
              f"makespan {pairs['makespan']}", flush=True)
        sets.append(pairs)
        p41.append(pairs)
    merged = distill.merge_pairs(sets)
    np.savez_compressed(PAIRS, **merged)
    print(f"saved {merged['obs'].shape[0]} pairs -> {PAIRS}")
    only41 = distill.merge_pairs(p41)
    np.savez_compressed(PAIRS41, **only41)
    print(f"saved {only41['obs'].shape[0]} ta41 pairs -> {PAIRS41}")


def finetune(stages=((2e-4, 3e-3, 200), (1e-4, 1e-3, 200),
                     (5e-5, 3e-4, 200)), pre=PRE, out=FINAL):
    params = checkpoint.load(pre, template_params())
    spec = inst.get_instance("ta41")
    best = None
    for lr, ent, updates in stages:
        cfg = CFG.replace(learning_rate=lr, entropy_coef=ent)
        t0 = time.time()
        ts, hist = learner.train(
            spec, batch_size=1024, num_updates=updates, config=cfg,
            log_every=50, init_params=params,
        )
        params = ts.params
        r = learner.evaluate_policy(params, spec, CFG)
        print(f"stage lr={lr} ent={ent}: greedy {r['greedy_makespan']} "
              f"({time.time() - t0:.1f}s)", flush=True)
        if best is None or r["greedy_makespan"] < best[0]:
            best = (r["greedy_makespan"], params)
    checkpoint.save(out, best[1])
    print(f"best greedy {best[0]} -> {out}")


def finetune_anchored(rounds=10, rl_updates=60, anchor_epochs=4,
                      rl_lr=1e-4, rl_ent=1e-3, anchor_lr=2e-4):
    """Anchored fine-tune: interleave on-policy REINFORCE rounds with CE
    anchor passes over the ta41 teacher pairs. The plain staged fine-tune
    measured the failure mode: the imitation prior is nearly deterministic
    (entropy ~0.15), RL alone drifts it to ~2480-class sampled play and the
    teacher knowledge washes out; a periodic CE pass pulls the policy back
    toward teacher actions in teacher-visited states while RL keeps fixing
    the states imitation never saw."""
    pairs = {k: v for k, v in np.load(PAIRS41).items()
             if k in ("obs", "mask", "valid", "action")}
    params = checkpoint.load(PRE, template_params())
    spec = inst.get_instance("ta41")
    env = vector.make_batch(spec, 2)
    cfg = CFG.replace(learning_rate=rl_lr, entropy_coef=rl_ent)
    best = (learner.evaluate_policy(params, spec, CFG)["greedy_makespan"],
            params)
    print(f"start: greedy {best[0]}", flush=True)
    for r in range(rounds):
        t0 = time.time()
        ts, _ = learner.train(
            spec, batch_size=1024, num_updates=rl_updates, config=cfg,
            log_every=rl_updates, log_fn=lambda *_: None,
            init_params=params,
        )
        params = distill.pretrain(
            jax.random.key(100 + r), pairs, env, CFG,
            epochs=anchor_epochs, batch_size=512, learning_rate=anchor_lr,
            params=ts.params,
        )
        g_rl = learner.evaluate_policy(ts.params, spec, CFG)
        g_anc = learner.evaluate_policy(params, spec, CFG)
        print(f"round {r}: rl {g_rl['greedy_makespan']} anchored "
              f"{g_anc['greedy_makespan']} ({time.time() - t0:.1f}s)",
              flush=True)
        for g, p in ((g_rl["greedy_makespan"], ts.params),
                     (g_anc["greedy_makespan"], params)):
            if g < best[0]:
                best = (g, p)
    checkpoint.save(FINAL, best[1])
    print(f"best greedy {best[0]} -> {FINAL}")


def evaluate(path):
    params = checkpoint.load(path, template_params())
    for name in NAMES:
        r = learner.evaluate_policy(params, inst.get_instance(name), CFG)
        print(f"{name}: greedy {r['greedy_makespan']}", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "collect"
    if cmd == "collect":
        collect()
    elif cmd == "pretrain":
        pretrain()
    elif cmd == "finetune":
        kw = {}
        if len(sys.argv) > 2:
            kw["pre"] = sys.argv[2]
        if len(sys.argv) > 3:
            kw["out"] = sys.argv[3]
        finetune(**kw)
    elif cmd == "augment_solve":
        augment_solve()
    elif cmd == "augment_collect":
        augment_collect()
    elif cmd == "finetune_anchored":
        finetune_anchored()
    elif cmd == "eval":
        evaluate(sys.argv[2])
    else:
        raise SystemExit(f"unknown command {cmd}")
