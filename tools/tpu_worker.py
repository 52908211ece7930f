"""Persistent TPU job worker: pays backend init once, then executes job files.

Protocol: drop `NAME.job.py` into the spool dir; the worker execs it (shared
globals across jobs, so state/caches persist), writes stdout+traceback to
`NAME.out`, and renames the job to `NAME.job.py.done`. A `READY` file appears
after backend init. Stop with `STOP.job.py` containing `WORKER_STOP = True`.
"""
import contextlib
import io
import os
import sys
import time
import traceback

SPOOL = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
os.makedirs(SPOOL, exist_ok=True)
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu")
t0 = time.time()
(jnp.arange(4) + 1).block_until_ready()
with open(os.path.join(SPOOL, "READY"), "w") as f:
    f.write(f"backend={jax.default_backend()} init={time.time()-t0:.0f}s pid={os.getpid()}\n")

G = {"jax": jax, "jnp": jnp}
while True:
    jobs = sorted(f for f in os.listdir(SPOOL) if f.endswith(".job.py"))
    for name in jobs:
        path = os.path.join(SPOOL, name)
        with open(path) as f:
            src = f.read()
        os.rename(path, path + ".running")
        out = os.path.join(SPOOL, name.replace(".job.py", ".out"))
        # stream output as the job runs (long jobs used to buffer until the
        # end, leaving multi-hour runs unobservable)
        with open(out, "w", buffering=1) as f:
            try:
                with contextlib.redirect_stdout(f):
                    exec(compile(src, name, "exec"), G)
            except BaseException:
                f.write(traceback.format_exc())
        os.rename(path + ".running", path + ".done")
        if G.pop("WORKER_STOP", False):
            sys.exit(0)
    time.sleep(0.5)
