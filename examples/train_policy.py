#!/usr/bin/env python
"""Train the masked-policy network with the sharded actor-learner.

Usage:
    python examples/train_policy.py [instance] [batch] [updates]

Envs shard over all local devices on a dp mesh; on a multi-host pod start one
process per host (jssenv_tpu.parallel.multihost.initialize()).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    instance = sys.argv[1] if len(sys.argv) > 1 else "ta01"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    updates = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    import jax

    from jssenv_tpu import checkpoint, instances as inst
    from jssenv_tpu.parallel import learner, mesh as meshlib, multihost

    multihost.initialize()
    m = meshlib.make_mesh()
    print(f"devices: {jax.device_count()} ({jax.default_backend()}), mesh {dict(m.shape)}")

    config = learner.LearnerConfig(unroll_steps=32, hidden=(256, 256))
    ts, history = learner.train(
        inst.get_instance(instance),
        batch_size=batch,
        num_updates=updates,
        config=config,
        mesh=m,
        log_every=max(1, updates // 20),
    )
    # deterministic outcome metric, comparable 1:1 with the greedy rules
    r = learner.evaluate_policy(
        ts.params, inst.get_instance(instance), config, stochastic_lanes=63
    )
    print(
        f"greedy-argmax makespan: {r['greedy_makespan']}  "
        f"(best of 63 sampled lanes: {r['best_sampled_makespan']})"
    )
    out = f"{instance}_policy.npz"
    checkpoint.save(out, ts.params)
    print(f"saved trained policy params to {out}")


if __name__ == "__main__":
    main()
