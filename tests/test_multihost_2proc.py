"""True multi-controller test: 2 processes, jax.distributed over localhost.

Each "host" process owns 4 virtual CPU devices and materializes only its own
lanes of a globally-sharded env batch (multihost.host_sharded_batch); the
rollout's episode stats reduce across hosts inside jit as XLA collectives.
Both processes must report identical global stats — the BASELINE config #5
topology (N>=2 hosts feeding a batched loop via collectives), shrunk to CPU.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
sys.path.insert(0, sys.argv[4])
import jax

# this environment may preload jax with a TPU platform before env vars apply
# (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

from jssenv_tpu.parallel import multihost
from jssenv_tpu import instances as inst

multihost.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
assert jax.process_count() == int(sys.argv[2])
mesh = multihost.global_mesh()
state = multihost.host_sharded_batch(inst.get_instance("ta01"), 64, mesh=mesh)
assert state.time.shape == (64,)  # global shape, locally sharded
state, stats = multihost.multihost_rollout(jax.random.key(0), state, 256)
eps = int(jax.device_get(stats.episodes))
mk = int(jax.device_get(stats.total_makespan))
t = int(jax.device_get(state.time.sum()))
print(f"RESULT {eps} {mk} {t}", flush=True)
"""


def _launch(coord, repo, env, n_procs):
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(n_procs), str(i), repo],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(n_procs)
    ]
    results = [p.communicate(timeout=420) for p in procs]
    return procs, results


def _run_distributed_rollout(n_procs, devices_per_proc):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    env.pop("JAX_NUM_PROCESSES", None)
    # bind-then-close port picking is racy; retry on a fresh port once rather
    # than flaking if another process grabbed it in the window
    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs, results = _launch(f"127.0.0.1:{port}", repo, env, n_procs)
        if all(p.returncode == 0 for p in procs):
            break
    outs = []
    for p, (out, err) in zip(procs, results):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append([ln for ln in out.splitlines() if ln.startswith("RESULT")][0])
    # every controller observes the same fully-reduced global stats
    assert all(o == outs[0] for o in outs)
    eps = int(outs[0].split()[1])
    assert eps > 0  # 256 steps per ta01 lane always completes episodes
    return outs[0]


def test_two_process_distributed_rollout():
    _run_distributed_rollout(n_procs=2, devices_per_proc=4)


def test_four_process_distributed_rollout():
    # same global 8-device mesh as the 2-proc test, split 4 ways
    _run_distributed_rollout(n_procs=4, devices_per_proc=2)
