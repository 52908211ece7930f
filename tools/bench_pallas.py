#!/usr/bin/env python
"""Benchmark the fused Pallas rollout kernel vs the XLA scan path on TPU.

Usage: python tools/bench_pallas.py [instance] [batch] [steps] [tile]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from jssenv_tpu import instances as inst, vector
from jssenv_tpu.core import pallas_rollout

name = sys.argv[1] if len(sys.argv) > 1 else "ta01"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
T = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
tile = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
spec = inst.get_instance(name)
state = vector.make_batch(spec, B)

t0 = time.time()
stats = jax.tree.map(
    lambda x: jax.block_until_ready(x), pallas_rollout.rollout_free(state, T, seed=1, tile=tile)
)
print(f"pallas compile+warmup: {time.time()-t0:.1f}s", flush=True)
for r in range(3):
    t0 = time.time()
    stats = pallas_rollout.rollout_free(state, T, seed=2 + r, tile=tile)
    stats = {k: np.asarray(v) for k, v in stats.items()}
    dt = time.time() - t0
    sps = B * T / dt
    eps = int(stats["episodes"])
    avg_mk = stats["total_makespan"] / max(eps, 1)
    print(
        f"pallas repeat {r}: {sps:,.0f} env-steps/s ({dt:.3f}s, {eps} episodes, "
        f"avg makespan {avg_mk:.0f}, min {stats['min_makespan']}, "
        f"viol={stats['identity_violations']})",
        flush=True,
    )
