"""Masked policy/value network for scheduling agents (the flagship model).

The reference has no model at all — its README points users at an external
RLlib example whose standard setup is exactly this: an MLP over the ``real_obs``
matrix with the action mask applied to the logits. Here it is TPU-native:

* matmul-heavy trunk (MXU-friendly: hidden widths default to multiples of 128,
  bfloat16 compute with float32 params);
* the action mask enters as ``-inf`` logits, so illegal actions carry exactly
  zero probability — the device-side analogue of the reference's
  ``p = mask / mask.sum()`` sampling (jss_env.py:709-711);
* a value head shared with the trunk for actor-critic learners.

The hidden dimension is the natural tensor-parallel axis: shard the first
Dense kernel's output dim and the second's input dim over the ``mp`` mesh axis
(see parallel.learner.partition_params).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedPolicyNet(nn.Module):
    """MLP over the flattened (J, 7) observation -> (J+1) masked logits + value."""

    num_actions: int
    hidden: Sequence[int] = (256, 256)
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, obs: jax.Array, mask: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """obs: (..., J, 7) float32; mask: (..., J+1) bool.

        Returns (logits (..., J+1) float32 with -inf on illegal actions,
        value (...,) float32).
        """
        x = obs.reshape(obs.shape[:-2] + (-1,)).astype(self.compute_dtype)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, name=f"trunk_{i}", dtype=self.compute_dtype)(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_actions, name="policy_head", dtype=self.compute_dtype)(x)
        logits = logits.astype(jnp.float32)
        value = nn.Dense(1, name="value_head", dtype=self.compute_dtype)(x)
        value = value.astype(jnp.float32)[..., 0]
        logits = jnp.where(mask, logits, -jnp.inf)
        # a terminal state has an all-False mask; keep logits finite there so
        # downstream log_softmax stays NaN-free (the action is ignored anyway)
        all_dead = ~mask.any(axis=-1, keepdims=True)
        logits = jnp.where(all_dead, 0.0, logits)
        return logits, value


def sample_action(
    rng: jax.Array, logits: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Sample from masked logits; returns (action, log_prob)."""
    action = jax.random.categorical(rng, logits, axis=-1)
    logp = jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), action[..., None], axis=-1
    )[..., 0]
    return action.astype(jnp.int32), logp
