"""Dev tool: per-component step-cost breakdown on the attached backend.

Times the full batched step against ablated variants (heuristics stubbed,
advance_time only) to locate the throughput bottleneck per instance size.
Usage: python tools/dev_profile.py [instance] [batch] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jssenv_tpu import instances as inst, vector
from jssenv_tpu.core import engine


def timed_rollout(state, num_steps, step_fn, seed=0):
    vstep = jax.vmap(step_fn)

    @jax.jit
    def run(rng, state):
        def body(carry, _):
            rng, state = carry
            rng, sub = jax.random.split(rng)
            actions = vector.random_legal_actions(sub, state)
            new_state, tr = vstep(state, actions)
            reset_state = vector.select_lanes(tr.done, vector.vreset(new_state), new_state)
            return (rng, reset_state), None

        (rng, state), _ = jax.lax.scan(body, (rng, state), None, length=num_steps)
        # tiny checksum: device_get of this is the only reliable way to force
        # completion on the remote-relay backend (block_until_ready can return
        # early on a fresh executable there)
        return state, jnp.sum(state.time)

    out, chk = run(jax.random.key(seed), state)
    jax.device_get(chk)  # compile+warmup
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        out, chk = run(jax.random.key(seed + 1 + r), state)
        jax.device_get(chk)
        best = min(best, time.time() - t0)
    return best


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ta71"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    spec = inst.get_instance(name)
    state = vector.make_batch(spec, batch)
    print(
        f"backend={jax.default_backend()} {name} J={spec.num_jobs} M={spec.num_machines} "
        f"pad=({state.jobs_pad},{state.machines_pad}) B={batch} T={steps}",
        flush=True,
    )

    ident = lambda s: s

    def step_full(s, a):
        return engine.step(s, a)

    def make_ablated(prio, noop):
        def step_fn(state, action):
            # inline copy of engine.step with heuristics swappable
            old_p, old_c = engine.prioritization_non_final, engine.check_no_op
            try:
                engine.prioritization_non_final = prio
                engine.check_no_op = noop
                return engine.step(state, action)
            finally:
                engine.prioritization_non_final = old_p
                engine.check_no_op = old_c

        return step_fn

    variants = [
        ("full step", step_full),
        ("no check_no_op", make_ablated(engine.prioritization_non_final, ident)),
        ("no prioritization", make_ablated(ident, engine.check_no_op)),
        ("no heuristics", make_ablated(ident, ident)),
    ]
    results = {}
    for label, fn in variants:
        dt = timed_rollout(state, steps, fn)
        sps = batch * steps / dt
        results[label] = dt
        print(f"{label:>20}: {dt:6.3f}s  {sps:12,.0f} env-steps/s", flush=True)

    full = results["full step"]
    for label in list(results)[1:]:
        print(f"{label:>20}: saves {100 * (1 - results[label] / full):5.1f}% of full step")


if __name__ == "__main__":
    main()
