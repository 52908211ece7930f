"""Layout experiment: batch-leading vs batch-minor (lanes) on TPU.

Batch-minor puts the env batch on the last axis of every leaf so it lands on
the TPU's 128-wide lane dimension; J/M become sublane/major dims. All vmap
plumbing, no engine changes.
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu")

from jssenv_tpu import instances as inst, vector
from jssenv_tpu.core import engine
from jssenv_tpu.core.state import EnvState

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 256

t0 = time.time()
(jnp.arange(4) + 1).block_until_ready()
print(f"init {time.time()-t0:.0f}s", flush=True)

spec = inst.get_instance("ta01")
state0 = vector.make_batch(spec, B)

# --- batch-minor state ---
bl = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1) if x.ndim > 1 else x, state0)
axes_last = jax.tree.map(lambda x: -1 if x.ndim > 1 else 0, state0)

step_bl = jax.vmap(engine.step, in_axes=(axes_last, 0), out_axes=(axes_last, 0))


def mask_bl(s):
    # legal (J,B), noop (B,) -> (J+1,B)
    return jnp.concatenate([s.legal, s.noop_legal[None, :]], axis=0)


def random_actions_bl(rng, s):
    mask = mask_bl(s)  # (J+1, B)
    safe = jnp.where(mask.any(axis=0, keepdims=True), mask, True)
    logits = jnp.where(safe, 0.0, -jnp.inf)
    a = jax.random.categorical(rng, logits, axis=0).astype(jnp.int32)  # (B,)
    jp = mask.shape[0] - 1
    return jnp.where(a == jp, s.num_jobs, a)


import functools


@functools.partial(jax.jit, static_argnames="num_steps")
def rollout_bl(rng, s, num_steps):
    fresh = jax.vmap(engine.reset, in_axes=axes_last, out_axes=axes_last)(s)

    def body(carry, _):
        rng, s, n_done = carry
        rng, sub = jax.random.split(rng)
        a = random_actions_bl(sub, s)
        s2, tr = step_bl(s, a)
        n_done = n_done + jnp.sum(tr.done, dtype=jnp.int32)
        s2 = jax.tree.map(
            lambda f, x: jnp.where(
                tr.done.reshape((1,) * (x.ndim - 1) + (-1,)) if x.ndim > 1 else tr.done,
                f,
                x,
            ),
            fresh,
            s2,
        )
        return (rng, s2, n_done), None

    (rng, s, n_done), _ = jax.lax.scan(body, (rng, s, jnp.int32(0)), None, length=num_steps)
    return s, n_done


# warm
t0 = time.time()
out, nd = rollout_bl(jax.random.key(0), bl, 16)
jax.block_until_ready(out)
print(f"batch-minor compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out, nd = rollout_bl(jax.random.key(1), bl, STEPS)
jax.block_until_ready(out)
dt = time.time() - t0
print(f"batch-minor B={B}: {B*STEPS/dt:,.0f} env-steps/s ({dt:.2f}s, {int(nd)} eps)", flush=True)

# baseline for comparison in the same process
t0 = time.time()
out, _ = vector.rollout(jax.random.key(0), state0, num_steps=16)
jax.block_until_ready(out)
print(f"batch-leading compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out, stats = vector.rollout(jax.random.key(1), state0, num_steps=STEPS)
jax.block_until_ready(out)
dt = time.time() - t0
print(f"batch-leading B={B}: {B*STEPS/dt:,.0f} env-steps/s ({dt:.2f}s)", flush=True)
