"""Device-mesh utilities: shard env batches over chips via NamedSharding.

The env batch axis is embarrassingly parallel — per-lane stepping needs no
communication — so sharding is pure data placement: every leaf of the batched
``EnvState`` pytree is split on its leading axis across the ``dp`` mesh axis
(SURVEY.md §2.4: batch parallelism over ICI). Cross-shard reductions (episode
stats, learner gradients) are left to XLA, which lowers them to ICI
collectives automatically under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jssenv_tpu.core.state import EnvState


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "dp",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 1-D data-parallel mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(state: EnvState, mesh: Mesh, axis_name: str = "dp") -> EnvState:
    """Place a batched EnvState with its batch axis split across devices.

    Scalars-per-env leaves are 1-D ``(B,)`` arrays and higher-rank leaves are
    ``(B, ...)``; both shard on axis 0. B must divide by the mesh size.
    """
    sharding = batch_sharding(mesh, axis_name)
    n = mesh.devices.size
    b = state.time.shape[0]
    if b % n != 0:
        raise ValueError(f"batch size {b} not divisible by mesh size {n}")
    return jax.device_put(state, sharding)


def sharded_rollout(
    mesh: Mesh,
    rng: jax.Array,
    state: EnvState,
    num_steps: int,
    policy=None,
    axis_name: str = "dp",
):
    """Rollout with the env batch sharded over the mesh.

    Identical semantics to ``vector.rollout``; the only difference is data
    placement — each device steps its shard of lanes, and the stats reduction
    at the end is an XLA cross-device reduction.
    """
    from jssenv_tpu import vector

    state = shard_batch(state, mesh, axis_name)
    if policy is None:
        policy = vector.random_legal_actions
    return vector.rollout(rng, state, num_steps=num_steps, policy=policy)
