"""Dev smoke: random-legal episode on ta01 through the jitted core."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from jssenv_tpu import instances as inst
from jssenv_tpu.core import engine

spec = inst.get_instance("ta01")
state = engine.state_from_spec(spec)
step = jax.jit(engine.step)

rng = np.random.default_rng(0)
t = 0
total_raw = 0
while True:
    mask = np.asarray(state.action_mask())
    if not mask.any():
        break
    probs = mask / mask.sum()
    a = rng.choice(len(mask), p=probs)
    # map padded no-op slot index (jobs_pad) to action id num_jobs
    if a == len(mask) - 1:
        a = int(state.num_jobs)
    state, tr = step(state, a)
    total_raw += int(tr.raw_reward)
    t += 1
    if bool(tr.done):
        break

makespan = int(state.time)
print("agent steps:", t, "makespan:", makespan, "raw reward:", total_raw)
print("identity check: 2*sum_op - machines*makespan =", 2 * spec.sum_op - spec.num_machines * makespan)
print("solution fully scheduled:", bool((np.asarray(state.solution)[:15, :15] >= 0).all()))
print("all ops done:", bool((np.asarray(state.next_op) == 15).all()))
