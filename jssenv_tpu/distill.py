"""Policy distillation from solver schedules: imitation pretrain + RL finetune.

The on-device solver (solve + tabu refinement) certifies schedules far
better than anything the RL policies reach from scratch (e.g. ta41: solver
~2121 vs trained-policy greedy 2415, round 4/5). This module bridges the
two (VERDICT r4 item 9): replay a solver schedule through the exact engine,
record every (observation, action-mask, allocated-job) decision, pretrain
the policy net on those pairs with cross-entropy, then hand the params to
the normal actor-learner for on-policy fine-tuning.

Caveat baked into the design: not every schedule is an agent-reachable
trajectory — the replay driver may advance time directly where the agent's
action space offers no legal no-op (the same reason the reference's golden
tests call ``increase_time_step()`` directly, reference
tests/test_solutions.py:68). The collected pairs are therefore treated as
state-conditioned action supervision (what to allocate when this state is
seen), not as a reproducible trajectory; the fine-tune stage corrects the
visitation mismatch on-policy.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jssenv_tpu.core import engine
from jssenv_tpu.core.state import EnvState
from jssenv_tpu.instances import InstanceSpec
from jssenv_tpu.parallel import learner as learner_mod


def collect_teacher_pairs(
    spec: InstanceSpec,
    machine_order: Sequence[Sequence[int]],
    config: Optional["learner_mod.LearnerConfig"] = None,
) -> dict:
    """Replay ``machine_order`` through the exact engine, recording every
    allocation decision as an (obs, mask, valid, action) training pair.

    Returns a dict of stacked arrays: ``obs (N, J, C)``, ``mask (N, J+1)``,
    ``valid (N, J)``, ``action (N,)`` (action indexes the model's padded
    action space: job id, or jobs_pad for no-op — no-ops never occur here).
    """
    config = config or learner_mod.LearnerConfig()
    state = engine.state_from_spec(spec)
    step = jax.jit(engine.step)
    advance = jax.jit(lambda s: engine.advance_time(s)[0])
    nm = int(state.num_machines)
    nj = int(state.num_jobs)
    idx = [0] * nm
    order = [list(machine_order[m]) for m in range(nm)]
    obs_l, mask_l, act_l = [], [], []

    def obs_of(s):
        if config.features == "rich":
            o = np.asarray(s.rich_obs)
        else:
            o = np.asarray(s.observation()["real_obs"])
        return o

    while not bool(state.done):
        acted = False
        host = jax.device_get(state)
        machine_legal = np.asarray(host.machine_legal)
        legal = np.asarray(host.legal)
        needed = np.asarray(host.needed_machine)
        for m in range(nm):
            if bool(state.done):
                break
            if machine_legal[m] and idx[m] < len(order[m]):
                job = order[m][idx[m]]
                if needed[job] == m and legal[job]:
                    obs_l.append(obs_of(state))
                    mask_l.append(np.asarray(state.action_mask()))
                    act_l.append(job)
                    state, _ = step(state, job)
                    idx[m] += 1
                    acted = True
                    host = jax.device_get(state)
                    machine_legal = np.asarray(host.machine_legal)
                    legal = np.asarray(host.legal)
                    needed = np.asarray(host.needed_machine)
        if not acted and not bool(state.done):
            if not bool(state.any_busy):
                raise RuntimeError("teacher schedule deadlocked in replay")
            state = advance(state)
    J = int(state.jobs_pad)
    return {
        "obs": np.stack(obs_l).astype(np.float32),
        "mask": np.stack(mask_l),
        "valid": np.broadcast_to(
            np.arange(J) < nj, (len(act_l), J)
        ).copy(),
        "action": np.asarray(act_l, np.int32),
        "makespan": int(state.time),
    }


def merge_pairs(pair_sets: Sequence[dict]) -> dict:
    keys = ("obs", "mask", "valid", "action")
    return {k: np.concatenate([p[k] for p in pair_sets]) for k in keys}


def pretrain(
    rng: jax.Array,
    pairs: dict,
    env_state: EnvState,
    config: "learner_mod.LearnerConfig",
    epochs: int = 50,
    batch_size: int = 512,
    learning_rate: float = 1e-3,
    params=None,
    log_fn=None,
    label_smooth: float = 0.0,
):
    """Cross-entropy imitation of the teacher actions; returns params.

    ``env_state`` only provides the model shapes (a 1-lane batch is fine).
    With ``config.arch='perjob'`` the pretrained params then run any (J, M).

    ``label_smooth`` spreads that fraction of the target mass uniformly
    over the pair's LEGAL actions (the recorded mask): pure imitation of a
    deterministic teacher collapses policy entropy (~0.15 measured on the
    ta41 teachers), which starves the downstream on-policy fine-tune of
    exploration; smoothing keeps the prior a distribution over plausible
    moves rather than a lookup table.
    """
    model = learner_mod.make_model(env_state, config)
    if params is None:
        params = model.init(
            rng, jnp.asarray(pairs["obs"][0]), jnp.asarray(pairs["mask"][0]),
            jnp.asarray(pairs["valid"][0]),
        )
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    N = pairs["obs"].shape[0]
    data = {k: jnp.asarray(v) for k, v in pairs.items()
            if k in ("obs", "mask", "valid", "action")}

    @jax.jit
    def train_epoch(params, opt_state, key):
        perm = jax.random.permutation(key, N)
        nb = max(N // batch_size, 1)

        def mb(carry, i):
            params, opt_state = carry
            sel = jax.lax.dynamic_slice_in_dim(
                perm, i * batch_size, batch_size
            )
            batch = {k: v[sel] for k, v in data.items()}

            def loss_fn(p):
                logits, _ = model.apply(
                    p, batch["obs"], batch["mask"], batch["valid"]
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                ce = -jnp.take_along_axis(
                    logp, batch["action"][:, None].astype(jnp.int32), axis=1
                )[:, 0]
                if label_smooth > 0.0:
                    legal = batch["mask"].astype(logp.dtype)
                    n_legal = jnp.maximum(legal.sum(axis=1), 1.0)
                    ce_unif = -(logp * legal).sum(axis=1) / n_legal
                    ce = (1.0 - label_smooth) * ce + label_smooth * ce_unif
                return jnp.mean(ce)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            mb, (params, opt_state), jnp.arange(nb)
        )
        return params, opt_state, jnp.mean(losses)

    for e in range(epochs):
        rng, key = jax.random.split(rng)
        params, opt_state, loss = train_epoch(params, opt_state, key)
        if log_fn and (e + 1) % max(1, epochs // 10) == 0:
            log_fn(f"pretrain epoch {e + 1}: ce={float(loss):.4f}")
    return params
