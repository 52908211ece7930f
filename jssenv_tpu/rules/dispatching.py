"""Dispatching rules as vectorized masked-priority kernels.

The reference implements seven classic dispatching rules as Python loops over
jobs that read env internals (reference: JSSEnv/dispatching.py:78-408). Here
each rule is a pure function ``EnvState -> (J,) priority vector``; action
selection is one masked argmin/argmax, so rule rollouts run entirely on device
(vmap over thousands of envs) while the class layer below preserves the
reference's host API (``DispatchingRule``, ``DISPATCHING_RULES``, ``get_rule``,
``compare_rules``).

Reference behavioral quirks preserved (SURVEY.md §2.3.7):
  * if the no-op is the only legal action, return it;
  * ties break to the lowest job index (strict </> comparisons == first
    occurrence of the extremum, which is exactly what argmin/argmax give);
  * an optional 10% exploratory no-op when no-op is legal — here behind an
    injectable, seedable PRNG (``explore_prob``/``rng``) instead of the
    reference's global ``np.random`` (dispatching.py:113).

Deliberate non-carryover: the reference CR rule caches due dates on a
module-level singleton shared across environments (its `_due_dates` persists
until a step at t=0; SURVEY.md §2.3.8 calls out the staleness bug). Due dates
here are recomputed from the instance (``1.5 * total job work``), which is
identical within any single environment/episode and simply never stale.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jssenv_tpu.core import ops
from jssenv_tpu.core.state import EnvState

_I32_MAX = jnp.iinfo(jnp.int32).max

PriorityFn = Callable[[EnvState], jax.Array]


# ---------------------------------------------------------------------------
# priority kernels (one per rule)
# ---------------------------------------------------------------------------


def current_op_duration(state: EnvState) -> jax.Array:
    """(J,) duration of each job's current op — SPT key (dispatching.py:105-106).

    Routed through ``core.ops.row_gather`` so the TPU lowering is a one-hot
    masked reduction, not a serialized gather (the same rewrite that made the
    anneal sweep 30x faster; raw ``take_along_axis`` under vmap dominated
    solve()'s rollout stage wall time in round 3)."""
    mp = state.machines_pad
    op = jnp.clip(state.next_op, 0, mp - 1)
    return ops.row_gather(state.op_dur, op)


def idle_since_last_op(state: EnvState) -> jax.Array:
    """(J,) idle time since last op — FIFO key (dispatching.py:146)."""
    return state.idle_since_op


def remaining_work(state: EnvState) -> jax.Array:
    """(J,) total processing time of ops not yet started — MWR/LWR/CR key
    (suffix sum over instance_matrix[j][todo:], dispatching.py:186-189).

    Computed as a masked suffix reduction (ops with position >= next_op) —
    pure VPU vector code, no cumsum + gather (TPU-slow under vmap)."""
    mp = state.machines_pad
    not_started = jnp.arange(mp, dtype=jnp.int32)[None, :] >= state.next_op[:, None]
    return jnp.sum(
        jnp.where(not_started, state.op_dur, 0), axis=1, dtype=jnp.int32
    )


def remaining_ops(state: EnvState) -> jax.Array:
    """(J,) number of ops left — MOR/LOR key (dispatching.py:273)."""
    return state.num_machines - state.next_op


def critical_ratio(state: EnvState, due_date_factor: float = 1.5) -> jax.Array:
    """(J,) CR key: (due_date - now) / remaining work; +inf when done
    (dispatching.py:351-398). Due date = factor * total job work."""
    total = jnp.sum(state.op_dur, axis=1).astype(jnp.float32)
    due = total * jnp.float32(due_date_factor)
    rem = remaining_work(state).astype(jnp.float32)
    time_left = due - state.time.astype(jnp.float32)
    return jnp.where(rem > 0, time_left / rem, jnp.inf)


# ---------------------------------------------------------------------------
# action selection
# ---------------------------------------------------------------------------


def select_action(
    state: EnvState,
    priority: jax.Array,
    minimize: bool,
    rng: Optional[jax.Array] = None,
    explore_prob: float = 0.1,
) -> jax.Array:
    """Masked argmin/argmax with the reference's selection protocol.

    Returns the no-op action id (``num_jobs``) when the no-op is the only
    legal action, or (when ``rng`` is given) with probability ``explore_prob``
    whenever the no-op is legal. On a terminal state (no legal action at all)
    it returns the no-op id, which ``step`` treats as an inert wait.
    """
    prio = priority.astype(jnp.float32)
    if minimize:
        masked = jnp.where(state.legal, prio, jnp.inf)
        best = jnp.argmin(masked).astype(jnp.int32)
    else:
        masked = jnp.where(state.legal, prio, -jnp.inf)
        best = jnp.argmax(masked).astype(jnp.int32)
    has_job = state.legal.any()
    action = jnp.where(has_job, best, state.num_jobs)
    if rng is not None:
        coin = jax.random.uniform(rng) < explore_prob
        action = jnp.where(state.noop_legal & coin, state.num_jobs, action)
    return action


# ---------------------------------------------------------------------------
# rule objects (reference-compatible API, dispatching.py:21-75)
# ---------------------------------------------------------------------------


class DispatchingRule:
    """A named dispatching rule usable on host envs and device state alike."""

    def __init__(
        self,
        name: str,
        description: str,
        priority_fn: PriorityFn,
        minimize: bool,
    ):
        self.name = name
        self.description = description
        self.priority_fn = priority_fn
        self.minimize = minimize

    def get_name(self) -> str:
        return self.name

    def get_description(self) -> str:
        return self.description

    # --- device path ---
    def priorities(self, state: EnvState) -> jax.Array:
        return self.priority_fn(state)

    def action(
        self,
        state: EnvState,
        rng: Optional[jax.Array] = None,
        explore_prob: float = 0.1,
    ) -> jax.Array:
        return select_action(
            state, self.priority_fn(state), self.minimize, rng, explore_prob
        )

    def policy(self, explore_prob: float = 0.0):
        """A batched policy ``(rng, state_batch) -> actions`` for vector.rollout."""

        def _policy(rng, state_batch):
            B = state_batch.time.shape[0]
            if explore_prob > 0.0:
                rngs = jax.random.split(rng, B)
                return jax.vmap(
                    lambda s, r: self.action(s, r, explore_prob)
                )(state_batch, rngs)
            return jax.vmap(lambda s: self.action(s, None))(state_batch)

        return _policy

    # --- host path (gym-style env with .state, .step) ---
    def _host_priorities(self, env) -> np.ndarray:
        """Numpy twin of the device priority kernel, reading the wrapper's
        public attributes (the way the reference rules read env internals)."""
        todo = np.asarray(env.todo_time_step_job)
        dur = np.asarray(env.instance_matrix[..., 1])
        machines = env.machines
        clip = np.clip(todo, 0, machines - 1)
        if self.name == "SPT":
            return dur[np.arange(env.jobs), clip].astype(np.float64)
        if self.name == "FIFO":
            return np.asarray(env.idle_time_jobs_last_op, dtype=np.float64)
        if self.name in ("MWR", "LWR", "CR"):
            cum = np.concatenate(
                [np.zeros((env.jobs, 1), np.int64), np.cumsum(dur, axis=1)], axis=1
            )
            remaining = dur.sum(axis=1) - cum[np.arange(env.jobs), np.minimum(todo, machines)]
            if self.name == "CR":
                due = dur.sum(axis=1) * 1.5
                time_left = due - env.current_time_step
                with np.errstate(divide="ignore"):
                    return np.where(
                        remaining > 0, time_left / np.maximum(remaining, 1), np.inf
                    )
            return remaining.astype(np.float64)
        if self.name in ("MOR", "LOR"):
            return (machines - todo).astype(np.float64)
        raise KeyError(self.name)  # pragma: no cover

    def __call__(self, env) -> int:
        """Select an action for a host env wrapper (see envs.gym_env.JssEnv)."""
        rng = None
        if getattr(env, "rule_rng", None) is not None:
            rng = env.rule_rng.next_key()
        if getattr(env, "uses_native_engine", False):
            mask = env.get_legal_actions()
            legal = mask[:-1]
            prio = self._host_priorities(env)
            masked = np.where(legal, prio, np.inf if self.minimize else -np.inf)
            best = int(np.argmin(masked) if self.minimize else np.argmax(masked))
            action = best if legal.any() else env.jobs
            if rng is not None and mask[-1]:
                import jax.random

                if float(jax.random.uniform(rng)) < 0.1:
                    action = env.jobs
            return action
        state = env.engine_state
        return int(self.action(state, rng))

    def run_episode(self, env) -> Tuple[float, int]:
        """Reset + follow this rule to termination; returns (return, makespan)
        (reference dispatching.py:55-75)."""
        env.reset()
        done = False
        total_reward = 0.0
        while not done:
            action = self(env)
            _, reward, done, _, _ = env.step(action)
            total_reward += float(reward)
        return total_reward, int(env.current_time_step)


DISPATCHING_RULES: Dict[str, DispatchingRule] = {
    "SPT": DispatchingRule(
        "SPT",
        "Shortest Processing Time: Schedule the job with the shortest processing time next",
        current_op_duration,
        minimize=True,
    ),
    "FIFO": DispatchingRule(
        "FIFO",
        "First In First Out: Schedule the job that has been waiting the longest",
        idle_since_last_op,
        minimize=False,
    ),
    "MWR": DispatchingRule(
        "MWR",
        "Most Work Remaining: Schedule the job with the most processing time remaining",
        remaining_work,
        minimize=False,
    ),
    "LWR": DispatchingRule(
        "LWR",
        "Least Work Remaining: Schedule the job with the least processing time remaining",
        remaining_work,
        minimize=True,
    ),
    "MOR": DispatchingRule(
        "MOR",
        "Most Operations Remaining: Schedule the job with the most operations remaining",
        remaining_ops,
        minimize=False,
    ),
    "LOR": DispatchingRule(
        "LOR",
        "Least Operations Remaining: Schedule the job with the fewest operations remaining",
        remaining_ops,
        minimize=True,
    ),
    "CR": DispatchingRule(
        "CR",
        "Critical Ratio: Schedule based on the ratio of time to due date versus remaining work",
        critical_ratio,
        minimize=True,
    ),
}


def get_rule(rule_name: str) -> DispatchingRule:
    """Look up a rule by name; raises ValueError on unknown names
    (reference dispatching.py:423-439)."""
    if rule_name not in DISPATCHING_RULES:
        raise ValueError(
            f"Rule '{rule_name}' not found. Available rules: "
            f"{list(DISPATCHING_RULES.keys())}"
        )
    return DISPATCHING_RULES[rule_name]


def compare_rules(
    env,
    rules: Optional[List[str]] = None,
    num_episodes: int = 10,
) -> Dict[str, Dict[str, float]]:
    """Run each rule for ``num_episodes`` episodes on a host env and average
    (reference dispatching.py:442-475).

    Note: the reference's rules flip an (unseeded) 10% exploratory no-op coin
    on every decision, so its averages have stochastic spread. Here the coin
    only runs when the env carries a rule PRNG — construct the env with
    ``env_config={"rule_seed": <int>}`` to reproduce that spread
    deterministically; the default is fully deterministic (all episodes of a
    rule identical)."""
    if rules is None:
        rules = list(DISPATCHING_RULES.keys())
    results: Dict[str, Dict[str, float]] = {}
    for rule_name in rules:
        rule = get_rule(rule_name)
        total_reward = 0.0
        total_makespan = 0.0
        for _ in range(num_episodes):
            reward, makespan = rule.run_episode(env)
            total_reward += reward
            total_makespan += makespan
        results[rule_name] = {
            "avg_reward": total_reward / num_episodes,
            "avg_makespan": total_makespan / num_episodes,
        }
    return results


def compare_rules_batched(
    source,
    rules: Optional[List[str]] = None,
    num_episodes: int = 10,
    max_steps: int = 4096,
    explore_prob: float = 0.0,
    seed: int = 0,
) -> Dict[str, Dict[str, float]]:
    """Device-batched compare_rules: every episode of every rule is a vmapped
    lane; one rollout per rule (BASELINE.json config #3).

    ``source`` is an InstanceSpec or InstanceSet (episodes tile across it).
    With ``explore_prob=0`` the rules are deterministic, so all episodes of a
    rule on one instance return identical makespans — use num_episodes>1 only
    with exploration enabled.
    """
    from jssenv_tpu import vector  # local import to avoid cycles

    if rules is None:
        rules = list(DISPATCHING_RULES.keys())
    results: Dict[str, Dict[str, float]] = {}
    for i, rule_name in enumerate(rules):
        rule = get_rule(rule_name)
        state = vector.make_batch(source, num_episodes)
        _, makespans, returns = vector.episode_makespans(
            jax.random.key(seed + i),
            state,
            max_steps=max_steps,
            policy=rule.policy(explore_prob=explore_prob),
        )
        makespans = np.asarray(makespans)
        returns = np.asarray(returns)
        if (makespans == 0).any():
            raise RuntimeError(
                f"{rule_name}: {int((makespans == 0).sum())} episodes did not "
                f"finish within max_steps={max_steps}"
            )
        results[rule_name] = {
            "avg_reward": float(returns.mean()),
            "avg_makespan": float(makespans.mean()),
        }
    return results
