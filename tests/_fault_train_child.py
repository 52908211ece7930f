"""Child process for the checkpoint fault-injection test (tests/test_aux.py).

Runs a tiny deterministic training loop, checkpointing the full TrainState
after every update. On start it resumes from the checkpoint if one exists.
Prints ``upd <i>`` after each update (the parent uses this to time a SIGKILL)
and ``digest <sha256>`` of the final params when all updates are done.
"""

import hashlib
import os
import sys

# force CPU regardless of the shell's preset platform (see tests/conftest.py)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jssenv_tpu import checkpoint, instances as inst, vector  # noqa: E402
from jssenv_tpu.parallel import learner  # noqa: E402


def params_digest(params) -> str:
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(params):
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()


def main() -> None:
    ckpt = sys.argv[1]
    n_updates = int(sys.argv[2])
    config = learner.LearnerConfig(unroll_steps=4, hidden=(32, 32))
    spec = inst.get_instance("ta01")
    env_state = vector.make_batch(spec, 8)
    ts = learner.init_train_state(jax.random.key(0), env_state, config)
    start = 0
    if os.path.exists(ckpt):
        ts = checkpoint.load(ckpt, ts)
        start = int(ts.steps)
    # Ack mode (JSS_FAULT_ACK=1): block on stdin after each update so the
    # parent's SIGKILL always lands while this process is alive — without it,
    # a fast child could finish all updates before the parent reads "upd 2"
    # from the buffered pipe and the kill would hit an exited process
    # (ADVICE r4).
    ack = os.environ.get("JSS_FAULT_ACK") == "1"
    step = jax.jit(learner.make_train_step(config))
    for i in range(start, n_updates):
        ts, _ = step(ts)
        jax.block_until_ready(ts.params)
        checkpoint.save(ckpt, ts)
        print(f"upd {i + 1}", flush=True)
        if ack:
            sys.stdin.readline()
    print(f"digest {params_digest(ts.params)}", flush=True)


if __name__ == "__main__":
    main()
