#!/usr/bin/env python
"""Multi-device scaling curve for the sharded rollout.

Runs ``parallel.mesh.sharded_rollout`` on 1/2/4/8 devices with the global
batch scaled proportionally (weak scaling: fixed lanes per device), printing
throughput and wall-clock time per vectorized step. On the CPU virtual mesh
the absolute numbers are meaningless; the *shape* of the curve is the check —
the per-step wall time (``step_us``) should stay near-flat as devices double
(each device keeps a fixed lane count), since the env batch axis needs no
cross-device communication until the final stats reduction.

Usage (virtual 8-device CPU mesh):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH=. python tools/bench_scaling.py [lanes_per_device] [steps]
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_platforms", "cpu")

from jssenv_tpu import instances as inst, vector
from jssenv_tpu.parallel import mesh as meshlib

LANES_PER_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 256
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def main() -> None:
    n_avail = len(jax.devices())
    spec = inst.get_instance("ta01")
    rows = []
    for n in (1, 2, 4, 8):
        if n > n_avail:
            break
        m = meshlib.make_mesh(n)
        batch = LANES_PER_DEV * n
        state = vector.make_batch(spec, batch)
        state = meshlib.shard_batch(state, m)
        # warm (compile per mesh size)
        _, st = vector.rollout(jax.random.key(0), state, num_steps=8)
        jax.device_get(st)
        best = 0.0
        for r in range(3):
            t0 = time.time()
            _, st = vector.rollout(jax.random.key(r + 1), state, num_steps=STEPS)
            st = jax.device_get(st)
            dt = time.time() - t0
            best = max(best, batch * STEPS / dt)
        # wall-clock per vectorized env step = dt / STEPS = batch / best;
        # under perfect weak scaling this stays flat as devices double
        # (each device keeps LANES_PER_DEV lanes) — ADVICE r3 fix
        step_us = 1e6 * batch / best
        rows.append(
            {
                "devices": n,
                "batch": batch,
                "steps_per_s": round(best),
                "step_us": round(step_us, 2),
                "episodes": int(st.episodes),
            }
        )
        print(
            f"devices={n} batch={batch}: {best:,.0f} steps/s "
            f"({int(st.episodes)} episodes)",
            file=sys.stderr,
            flush=True,
        )
    scale = rows[-1]["steps_per_s"] / rows[0]["steps_per_s"] if rows else 0
    print(json.dumps({"weak_scaling": rows, "speedup_at_max": round(scale, 2)}))


if __name__ == "__main__":
    main()
