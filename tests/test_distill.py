"""Distillation: solver-schedule imitation pretraining + finetune handoff."""

import jax
import numpy as np

from jssenv_tpu import distill, instances as inst, solve, vector
from jssenv_tpu.parallel import learner


def test_collect_pretrain_finetune_roundtrip():
    spec = inst.random_instance(8, 6, duration_range=(1, 30), seed=4)
    res = solve.solve(spec, batch=64, sweeps=2, seed=0, refine_iters=200,
                      refine_method="tabu", tabu_chains=16, tabu_proposals=4)
    cfg = learner.LearnerConfig(hidden=(64, 64), arch="perjob",
                                features="rich", unroll_steps=24)
    pairs = distill.collect_teacher_pairs(spec, res.machine_order(), cfg)
    # the teacher replay reproduces the certified makespan exactly, and
    # every recorded action was legal in its recorded state
    assert pairs["makespan"] == res.makespan
    assert pairs["obs"].shape[0] == spec.num_jobs * spec.num_machines
    taken = pairs["mask"][np.arange(len(pairs["action"])), pairs["action"]]
    assert taken.all()

    env_state = vector.make_batch(spec, 4)
    untrained = learner.init_train_state(jax.random.key(0), env_state, cfg)
    base = learner.evaluate_policy(untrained.params, spec, cfg)
    params = distill.pretrain(jax.random.key(0), pairs, env_state, cfg,
                              epochs=60, batch_size=16)
    out = learner.evaluate_policy(params, spec, cfg)
    # imitation pulls greedy play toward the teacher schedule
    assert out["greedy_makespan"] <= base["greedy_makespan"]
    assert out["greedy_makespan"] <= int(1.25 * res.makespan)

    # warm-start finetune accepts the pretrained params
    ts, _ = learner.train(spec, batch_size=16, num_updates=2, config=cfg,
                          log_every=1, log_fn=lambda *_: None,
                          init_params=params)
    assert int(ts.steps) == 2


def test_merge_pairs():
    spec = inst.random_instance(6, 5, duration_range=(1, 20), seed=2)
    res = solve.solve(spec, batch=32, sweeps=2, seed=1)
    cfg = learner.LearnerConfig(hidden=(32, 32), arch="perjob")
    p1 = distill.collect_teacher_pairs(spec, res.machine_order(), cfg)
    merged = distill.merge_pairs([p1, p1])
    assert merged["obs"].shape[0] == 2 * p1["obs"].shape[0]
