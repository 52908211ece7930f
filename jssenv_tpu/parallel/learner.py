"""Sharded actor-learner: batched env rollouts feeding a policy-gradient
learner, entirely on device (BASELINE.json config #5).

One jitted ``train_step`` = T-step on-policy rollout (vmapped envs, auto-reset)
+ returns computation + REINFORCE-with-baseline update. Parallelism layout:

* env batch axis  -> ``dp`` mesh axis (pure data placement, no communication);
* model hidden dim -> optional ``mp`` mesh axis (Megatron-style column/row
  parallel Dense pair, see ``partition_params``);
* gradient reduction across ``dp`` and the row-parallel matmul reduction
  across ``mp`` are inserted by XLA as ICI collectives from the sharding
  annotations — no hand-written NCCL-style code anywhere.

The reference has no learner; its README delegates RL training to external
RLlib examples. This module is the TPU-native equivalent of that training
setup, co-designed with the engine so observations never leave the device.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jssenv_tpu import vector
from jssenv_tpu.core.state import EnvState
from jssenv_tpu.models.policy import (
    MaskedPolicyNet,
    PerJobPolicyNet,
    sample_action,
)


@struct.dataclass
class LearnerConfig:
    unroll_steps: int = struct.field(pytree_node=False, default=32)
    gamma: float = struct.field(pytree_node=False, default=0.99)
    learning_rate: float = struct.field(pytree_node=False, default=3e-4)
    value_coef: float = struct.field(pytree_node=False, default=0.5)
    entropy_coef: float = struct.field(pytree_node=False, default=0.01)
    hidden: Tuple[int, ...] = struct.field(pytree_node=False, default=(256, 256))
    # algo: "reinforce" (returns-to-go baseline) or "ppo" (GAE + clipped
    # surrogate over several minibatch epochs)
    algo: str = struct.field(pytree_node=False, default="reinforce")
    gae_lambda: float = struct.field(pytree_node=False, default=0.95)
    clip_eps: float = struct.field(pytree_node=False, default=0.2)
    ppo_epochs: int = struct.field(pytree_node=False, default=2)
    minibatches: int = struct.field(pytree_node=False, default=4)
    # observation features: "reference" = the 7 reference columns;
    # "rich" = those plus 6 rule-aligned channels (EnvState.rich_obs)
    features: str = struct.field(pytree_node=False, default="reference")
    # policy architecture: "flat" = MaskedPolicyNet (J*C -> J+1 MLP, fastest,
    # size-locked); "perjob" = PerJobPolicyNet (shared per-job scorer +
    # pooled context — one checkpoint runs any (J, M); VERDICT r4)
    arch: str = struct.field(pytree_node=False, default="flat")
    # REINFORCE loss-gradient accumulation: split the (T, B) trajectory into
    # this many equal T-chunks and sum per-chunk grads. The loss is a mean
    # over (T, B) elements, so equal chunks give BITWISE-equivalent-up-to-
    # float-reassociation gradients while dividing the backward activation
    # footprint by the chunk count — full-episode unrolls (T=640 at 30x20)
    # with the perjob arch would otherwise hold T*B*J*hidden activations.
    loss_chunks: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    env_state: EnvState
    rng: jax.Array
    steps: jax.Array  # () int32 — learner updates applied


def make_model(state: EnvState, config: LearnerConfig):
    if config.arch == "perjob":
        return PerJobPolicyNet(hidden=config.hidden[0], depth=len(config.hidden))
    if config.arch != "flat":
        raise ValueError(f"unknown arch {config.arch!r}")
    return MaskedPolicyNet(
        num_actions=state.jobs_pad + 1, hidden=config.hidden
    )


def valid_batch(env_state: EnvState) -> jax.Array:
    """(B, J) bool: which job rows exist per lane (ragged batches pad J)."""
    return (
        jnp.arange(env_state.jobs_pad, dtype=jnp.int32)[None, :]
        < env_state.num_jobs[:, None]
    )


def obs_batch(env_state: EnvState, config: LearnerConfig) -> jax.Array:
    """(B, J, C) policy observation per config.features, with column 0 set to
    the legal mask (as the reference's _get_current_state_representation)."""
    if config.features == "rich":
        obs = jax.vmap(lambda s: s.rich_obs)(env_state)
        return obs.at[..., 0].set(env_state.legal.astype(obs.dtype))
    return jax.vmap(lambda s: s.observation()["real_obs"])(env_state)


def make_optimizer(config: LearnerConfig) -> optax.GradientTransformation:
    return optax.adam(config.learning_rate)


def init_train_state(
    rng: jax.Array, env_state: EnvState, config: LearnerConfig,
    params: Any = None,
) -> TrainState:
    """env_state: batched (B, ...) EnvState. ``params`` warm-starts from an
    existing checkpoint (e.g. distillation pretraining, jssenv_tpu.distill)
    instead of a fresh init."""
    model = make_model(env_state, config)
    if params is None:
        obs0 = obs_batch(env_state, config)[0]
        mask0 = jax.vmap(EnvState.action_mask)(env_state)[0]
        params = model.init(rng, obs0, mask0, valid_batch(env_state)[0])
    opt_state = make_optimizer(config).init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        env_state=env_state,
        rng=rng,
        steps=jnp.int32(0),
    )


def _policy_rollout(model, params, env_state, rng, config):
    """Collect an on-policy T-step trajectory with auto-reset."""

    def body(carry, _):
        env_state, rng, stats = carry
        rng, sub = jax.random.split(rng)
        obs = obs_batch(env_state, config)
        mask = jax.vmap(EnvState.action_mask)(env_state)
        valid = valid_batch(env_state)
        logits, value = model.apply(params, obs, mask, valid)
        action_idx, logp = sample_action(sub, logits)
        # padded no-op slot (index jobs_pad) -> env no-op action id (num_jobs)
        actions = jnp.where(
            action_idx == env_state.jobs_pad, env_state.num_jobs, action_idx
        )
        env_state, tr, stats = vector.step_autoreset(env_state, actions, stats)
        frame = dict(
            obs=obs, mask=mask, valid=valid, action=action_idx,
            reward=tr.reward, done=tr.done, value=value, logp=logp,
        )
        return (env_state, rng, stats), frame

    (env_state, rng, stats), traj = jax.lax.scan(
        body,
        (env_state, rng, vector.RolloutStats.zero()),
        None,
        length=config.unroll_steps,
    )
    return env_state, rng, stats, traj


def _returns(traj, config):
    """Discounted returns-to-go with episode-boundary resets."""

    def body(carry, frame):
        ret = frame["reward"] + config.gamma * carry * (1.0 - frame["done"])
        return ret, ret

    _, rets = jax.lax.scan(
        body,
        jnp.zeros_like(traj["reward"][0]),
        traj,
        reverse=True,
    )
    return rets


def _gae(traj, last_value, config):
    """Generalized advantage estimation with episode-boundary resets."""

    def body(carry, frame):
        adv_next, v_next = carry
        nonterm = 1.0 - frame["done"]
        delta = frame["reward"] + config.gamma * v_next * nonterm - frame["value"]
        adv = delta + config.gamma * config.gae_lambda * nonterm * adv_next
        return (adv, frame["value"]), adv

    (_, _), advs = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        traj,
        reverse=True,
    )
    return advs


def _entropy(logp_all, mask):
    """Masked policy entropy with NaN-safe gradients (sanitize the -inf
    logits BEFORE multiplying)."""
    safe_logp = jnp.where(mask, logp_all, 0.0)
    probs = jnp.where(mask, jnp.exp(safe_logp), 0.0)
    return -jnp.mean(jnp.sum(probs * safe_logp, axis=-1))


def make_train_step(
    config: LearnerConfig,
) -> Callable[[TrainState], Tuple[TrainState, dict]]:
    """Build the jittable train step (close over static config)."""
    if config.algo == "ppo":
        return _make_ppo_step(config)
    if config.algo != "reinforce":
        raise ValueError(f"unknown algo {config.algo!r}")

    optimizer = make_optimizer(config)

    def train_step(ts: TrainState) -> Tuple[TrainState, dict]:
        model = make_model(ts.env_state, config)
        rng, roll_rng = jax.random.split(ts.rng)
        env_state, _, stats, traj = _policy_rollout(
            model, ts.params, ts.env_state, roll_rng, config
        )
        rets = _returns(traj, config)

        def loss_fn(params, traj_c, rets_c):
            logits, values = model.apply(
                params, traj_c["obs"], traj_c["mask"], traj_c["valid"]
            )
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp = jnp.take_along_axis(
                logp_all, traj_c["action"][..., None], axis=-1
            )[..., 0]
            adv = jax.lax.stop_gradient(rets_c - values)
            pg_loss = -jnp.mean(logp * adv)
            v_loss = jnp.mean((values - rets_c) ** 2)
            ent = _entropy(logp_all, traj_c["mask"])
            loss = pg_loss + config.value_coef * v_loss - config.entropy_coef * ent
            return loss, dict(pg_loss=pg_loss, v_loss=v_loss, entropy=ent)

        nc = int(config.loss_chunks)
        if nc <= 1:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ts.params, traj, rets
            )
        else:
            # equal T-chunks -> the full-batch mean is the mean of chunk
            # means, so summed-then-averaged chunk grads equal the one-shot
            # grads (up to float reassociation) at 1/nc the backward memory
            T = rets.shape[0]
            if T % nc != 0:
                raise ValueError(
                    f"loss_chunks ({nc}) must divide unroll_steps ({T})"
                )
            tc = T // nc
            fields = ("obs", "mask", "valid", "action")

            def chunk_body(carry, i):
                loss_a, aux_a, grads_a = carry
                sl = lambda v: jax.lax.dynamic_slice_in_dim(v, i * tc, tc, 0)
                traj_c = {k: sl(traj[k]) for k in fields}
                (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    ts.params, traj_c, sl(rets)
                )
                return (
                    loss_a + l,
                    jax.tree.map(jnp.add, aux_a, a),
                    jax.tree.map(jnp.add, grads_a, g),
                ), None

            zero_aux = dict(pg_loss=0.0, v_loss=0.0, entropy=0.0)
            zero_g = jax.tree.map(jnp.zeros_like, ts.params)
            (loss, aux, grads), _ = jax.lax.scan(
                chunk_body, (0.0, zero_aux, zero_g), jnp.arange(nc)
            )
            loss, aux, grads = jax.tree.map(
                lambda x: x / nc, (loss, aux, grads)
            )
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics = dict(
            loss=loss,
            episodes=stats.episodes,
            total_makespan=stats.total_makespan,
            min_makespan=stats.min_makespan,
            **aux,
        )
        return (
            TrainState(
                params=params,
                opt_state=opt_state,
                env_state=env_state,
                rng=rng,
                steps=ts.steps + 1,
            ),
            metrics,
        )

    return train_step


def _make_ppo_step(config: LearnerConfig):
    """PPO: GAE advantages + clipped surrogate over minibatch epochs."""
    optimizer = make_optimizer(config)

    def train_step(ts: TrainState) -> Tuple[TrainState, dict]:
        model = make_model(ts.env_state, config)
        rng, roll_rng, perm_rng = jax.random.split(ts.rng, 3)
        env_state, _, stats, traj = _policy_rollout(
            model, ts.params, ts.env_state, roll_rng, config
        )
        # bootstrap value of the post-rollout state
        obs_last = obs_batch(env_state, config)
        mask_last = jax.vmap(EnvState.action_mask)(env_state)
        _, last_value = model.apply(
            ts.params, obs_last, mask_last, valid_batch(env_state)
        )
        advs = _gae(traj, last_value, config)
        rets = advs + traj["value"]
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)

        # flatten (T, B) -> (N,) and run epochs x minibatches of updates
        T, B = traj["reward"].shape
        N = T * B
        flat = {
            "obs": traj["obs"].reshape(N, *traj["obs"].shape[2:]),
            "mask": traj["mask"].reshape(N, -1),
            "valid": traj["valid"].reshape(N, -1),
            "action": traj["action"].reshape(N),
            "logp_old": traj["logp"].reshape(N),
            "adv": advs.reshape(N),
            "ret": rets.reshape(N),
        }
        mb_size = N // config.minibatches

        def loss_fn(params, batch):
            logits, values = model.apply(
                params, batch["obs"], batch["mask"], batch["valid"]
            )
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp = jnp.take_along_axis(
                logp_all, batch["action"][..., None], axis=-1
            )[..., 0]
            ratio = jnp.exp(logp - batch["logp_old"])
            clipped = jnp.clip(ratio, 1.0 - config.clip_eps, 1.0 + config.clip_eps)
            pg_loss = -jnp.mean(
                jnp.minimum(ratio * batch["adv"], clipped * batch["adv"])
            )
            v_loss = jnp.mean((values - batch["ret"]) ** 2)
            ent = _entropy(logp_all, batch["mask"])
            loss = pg_loss + config.value_coef * v_loss - config.entropy_coef * ent
            return loss, dict(pg_loss=pg_loss, v_loss=v_loss, entropy=ent)

        def epoch_body(carry, epoch_rng):
            params, opt_state = carry
            perm = jax.random.permutation(epoch_rng, N)

            def mb_body(carry, mb_idx):
                params, opt_state = carry
                sel = jax.lax.dynamic_slice_in_dim(perm, mb_idx * mb_size, mb_size)
                batch = {k: v[sel] for k, v in flat.items()}
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), dict(loss=loss, **aux)

            (params, opt_state), ms = jax.lax.scan(
                mb_body,
                (params, opt_state),
                jnp.arange(config.minibatches),
            )
            return (params, opt_state), ms

        epoch_rngs = jax.random.split(perm_rng, config.ppo_epochs)
        (params, opt_state), ms = jax.lax.scan(
            epoch_body, (ts.params, ts.opt_state), epoch_rngs
        )
        metrics = dict(
            loss=ms["loss"][-1, -1],
            pg_loss=ms["pg_loss"][-1, -1],
            v_loss=ms["v_loss"][-1, -1],
            entropy=ms["entropy"][-1, -1],
            episodes=stats.episodes,
            total_makespan=stats.total_makespan,
            min_makespan=stats.min_makespan,
        )
        return (
            TrainState(
                params=params,
                opt_state=opt_state,
                env_state=env_state,
                rng=rng,
                steps=ts.steps + 1,
            ),
            metrics,
        )

    return train_step


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def greedy_policy(params, config: LearnerConfig):
    """Deterministic policy: argmax over masked logits (no sampling)."""

    def policy(rng, env_state):
        del rng
        model = make_model(env_state, config)
        obs = obs_batch(env_state, config)
        mask = jax.vmap(EnvState.action_mask)(env_state)
        logits, _ = model.apply(params, obs, mask, valid_batch(env_state))
        a = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jnp.where(a == env_state.jobs_pad, env_state.num_jobs, a)

    return policy


def evaluate_policy(
    params,
    source,
    config: LearnerConfig,
    stochastic_lanes: int = 0,
    seed: int = 0,
    max_steps: Optional[int] = None,
) -> dict:
    """Deterministic eval: greedy-argmax rollout to the first episode end.

    The VERDICT-grade outcome metric: what makespan does the trained policy
    actually achieve when run greedily on an instance (comparable 1:1 with
    the dispatching rules' greedy makespans)? With ``stochastic_lanes`` > 0, a
    batch of additional sampled-policy lanes runs alongside and their best
    makespan is reported too (a cheap test-time search mode).
    """
    B = 1 + int(stochastic_lanes)
    env_state = vector.make_batch(source, B)
    env_state = vector.strip_solution(env_state)
    model = make_model(env_state, config)
    jp = env_state.jobs_pad
    greedy = greedy_policy(params, config)

    def policy(rng, s):
        obs = obs_batch(s, config)
        mask = jax.vmap(EnvState.action_mask)(s)
        logits, _ = model.apply(params, obs, mask, valid_batch(s))
        a_samp, _ = sample_action(rng, logits)
        a_greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lane = jnp.arange(a_samp.shape[0])
        a = jnp.where(lane == 0, a_greedy, a_samp)
        return jnp.where(a == jp, s.num_jobs, a)

    if max_steps is None:
        jp_, mp_ = env_state.jobs_pad, env_state.machines_pad
        max_steps = 4 * jp_ * mp_ + 64
    _, ms, _ = vector.episode_makespans(
        jax.random.key(seed),
        env_state,
        max_steps=max_steps,
        policy=policy if stochastic_lanes else greedy,
    )
    ms = jax.device_get(ms)
    out = {"greedy_makespan": int(ms[0])}
    if stochastic_lanes:
        out["best_sampled_makespan"] = int(ms.min())
        out["avg_sampled_makespan"] = float(ms[1:].mean())
    return out


# ---------------------------------------------------------------------------
# sharding layout
# ---------------------------------------------------------------------------


def partition_params(params, mesh: Mesh, mp_axis: str = "mp"):
    """Megatron-style tensor-parallel placement for the policy MLP.

    trunk_0 is column-parallel (kernel (in, h) -> P(None, mp), bias P(mp));
    trunk_1 is row-parallel (kernel (h, h') -> P(mp, None), bias replicated);
    heads are replicated. XLA inserts the psum for the row-parallel matmul.
    """

    def spec_for(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        name = "/".join(names)
        # flat arch: trunk_0/trunk_1; perjob arch: job_0/job_1 (same
        # column-then-row parallel Dense pair shape)
        col = "trunk_0" in name or "job_0" in name
        row = "trunk_1" in name or "job_1" in name
        if col and leaf.ndim == 2:
            return P(None, mp_axis)
        if col and leaf.ndim == 1:
            return P(mp_axis)
        if row and leaf.ndim == 2:
            return P(mp_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, spec_for(path, leaf))
        ),
        params,
    )


def shard_train_state(
    ts: TrainState, mesh: Mesh, dp_axis: str = "dp", mp_axis: Optional[str] = None
) -> TrainState:
    """Place a TrainState on the mesh: envs split over dp, params replicated
    (or tensor-parallel over mp when given), optimizer state mirroring params."""
    env_sharding = NamedSharding(mesh, P(dp_axis))
    env_state = jax.device_put(ts.env_state, env_sharding)
    if mp_axis is not None:
        params = partition_params(ts.params, mesh, mp_axis)
        # adam moments follow the param layout: optax's ScaleByAdamState holds
        # mu/nu as param-congruent pytrees — place each moment leaf with its
        # parameter's sharding and replicate everything else (count etc.)
        rep = NamedSharding(mesh, P())

        def place_state(entry):
            if hasattr(entry, "mu") and hasattr(entry, "nu"):
                mu = jax.tree.map(
                    lambda p, m: jax.device_put(m, p.sharding), params, entry.mu
                )
                nu = jax.tree.map(
                    lambda p, n: jax.device_put(n, p.sharding), params, entry.nu
                )
                entry = entry._replace(mu=mu, nu=nu)
                if hasattr(entry, "count"):
                    entry = entry._replace(count=jax.device_put(entry.count, rep))
                return entry
            return jax.device_put(entry, rep)

        opt_state = tuple(place_state(e) for e in ts.opt_state)
    else:
        rep = NamedSharding(mesh, P())
        params = jax.device_put(ts.params, rep)
        opt_state = jax.device_put(ts.opt_state, rep)
    rng = jax.device_put(ts.rng, NamedSharding(mesh, P()))
    steps = jax.device_put(ts.steps, NamedSharding(mesh, P()))
    return TrainState(
        params=params,
        opt_state=opt_state,
        env_state=env_state,
        rng=rng,
        steps=steps,
    )


def train(
    source,
    batch_size: int = 1024,
    num_updates: int = 100,
    config: Optional[LearnerConfig] = None,
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    log_every: int = 10,
    log_fn=print,
    light: bool = True,
    init_params=None,
):
    """Host convenience loop: build envs, shard, and run train steps.

    ``light=True`` (default) drops the solution start-time matrix from the
    env state — training never reads it, and it is the largest rollout-carry
    tensor (vector.strip_solution). ``init_params`` warm-starts the policy
    (distillation fine-tune path)."""
    config = config or LearnerConfig()
    env_state = vector.make_batch(source, batch_size)
    if light:
        env_state = vector.strip_solution(env_state)
    rng = jax.random.key(seed)
    ts = init_train_state(rng, env_state, config, params=init_params)
    if mesh is not None:
        ts = shard_train_state(ts, mesh)
    # no donation: freshly-initialized states can alias identical zero
    # constants across leaves, and donating the same buffer twice is an error
    step = jax.jit(make_train_step(config))
    history = []
    # episodes finish in lockstep bursts every ~(episode_len / unroll_steps)
    # updates, so accumulate between log points instead of sampling one update
    acc_eps, acc_ms = 0, 0
    for i in range(num_updates):
        ts, metrics = step(ts)
        m = jax.device_get(metrics)
        acc_eps += int(m["episodes"])
        acc_ms += int(m["total_makespan"])
        if (i + 1) % log_every == 0 or i + 1 == num_updates:
            avg_ms = acc_ms / acc_eps if acc_eps else float("nan")
            history.append(
                dict(
                    update=i + 1,
                    loss=float(m["loss"]),
                    episodes=acc_eps,
                    avg_makespan=avg_ms,
                )
            )
            log_fn(
                f"update {i + 1}: loss={float(m['loss']):.4f} "
                f"episodes={acc_eps} avg_makespan={avg_ms:.0f} "
                f"entropy={float(m['entropy']):.3f}"
            )
            acc_eps, acc_ms = 0, 0
    return ts, history
