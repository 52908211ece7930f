"""Multi-host scale-out: per-host env shards over DCN feeding one global batch.

The reference is strictly single-process (SURVEY.md §2.4). The TPU-native
scale-out path is JAX's standard multi-controller model: one process per host,
``jax.distributed.initialize`` to form the global runtime, each host
constructing its local lanes of the global env batch, and
``jax.make_array_from_process_local_data`` assembling the global sharded
array. All cross-host reduction (learner gradients, episode stats) happens
inside jit as XLA collectives over DCN — there is no hand-written
communication code to maintain.

Single-process fallback: with ``process_count == 1`` every helper degrades to
the plain single-host behavior, so the same driver script runs anywhere.
"""

from __future__ import annotations

import os
from typing import Optional, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jssenv_tpu import vector
from jssenv_tpu.core.state import EnvState
from jssenv_tpu.instances import InstanceSet, InstanceSpec, stack_instances


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host runtime. No-op when running single-host with no
    coordinator configured, or when the runtime is already initialized.

    Environment-variable driven on TPU pods (JAX auto-detects); explicit args
    support manual CPU/GPU bring-up. IMPORTANT: this must run before anything
    initializes the XLA backend, so the no-op decision is made from the
    arguments/environment alone — calling e.g. ``jax.process_count()`` here
    would itself initialize the backend and doom ``distributed.initialize``.
    """
    configured = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
        or "JAX_COORDINATOR_ADDRESS" in os.environ
        or os.environ.get("JAX_NUM_PROCESSES")
    )
    if not configured:
        return  # single-host run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # second call in the same process
        raise


def global_mesh(axis_name: str = "dp") -> Mesh:
    """1-D mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_sharded_batch(
    source: Union[InstanceSpec, InstanceSet],
    global_batch: int,
    mesh: Optional[Mesh] = None,
    axis_name: str = "dp",
) -> EnvState:
    """Build a globally-sharded env batch where each host materializes ONLY its
    own lanes (deterministic host -> lane assignment: contiguous blocks by
    process index; instances tile round-robin over the GLOBAL lane index so the
    instance mix is identical regardless of host count).
    """
    mesh = mesh or global_mesh(axis_name)
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {n_proc}"
        )
    local_batch = global_batch // n_proc
    offset = jax.process_index() * local_batch

    if isinstance(source, InstanceSpec):
        source = stack_instances([source])
    n = len(source)
    lane_idx = (np.arange(local_batch) + offset) % n
    om = np.asarray(source.op_machine)[lane_idx]
    od = np.asarray(source.op_dur)[lane_idx]
    nj = np.asarray(source.num_jobs)[lane_idx]
    nm = np.asarray(source.num_machines)[lane_idx]
    # build local lanes on the host's local devices, then assemble the global
    # array without any cross-host data movement
    import jax.numpy as jnp

    local_state = jax.vmap(
        lambda a, b, c, d: _init(a, b, c, d)
    )(jnp.asarray(om), jnp.asarray(od), jnp.asarray(nj), jnp.asarray(nm))
    from jssenv_tpu.core import engine as _engine

    local_state = _engine.compact_static_tables(
        local_state, max_job_length=int(np.asarray(source.op_dur).sum(axis=2).max())
    )
    sharding = NamedSharding(mesh, P(axis_name))
    global_shape_of = lambda x: (global_batch,) + x.shape[1:]
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape_of(x)
        ),
        local_state,
    )


def _init(om, od, nj, nm):
    from jssenv_tpu.core import engine

    return engine.init_state(om, od, nj, nm)


def multihost_rollout(
    rng: jax.Array,
    state: EnvState,
    num_steps: int,
    policy=None,
):
    """Rollout over the global batch; stats come back fully reduced (the sums
    inside vector.rollout reduce across all shards/hosts under jit)."""
    if policy is None:
        policy = vector.random_legal_actions
    return vector.rollout(rng, state, num_steps=num_steps, policy=policy)
