"""Stateful vectorized env: an object-style surface over the functional batch
layer, for users who want a classic ``reset()/step(actions)`` loop over many
envs without managing the EnvState pytree themselves.

The reference has no vectorized env at all (SURVEY.md §2.4); this is the
"thousands of envs behind one object" counterpart of the single-env gym
wrapper. All stepping stays on device; host numpy conversion happens only for
the values the caller asked for (``to_numpy=True``, the default).

Semantics: auto-reset — a lane that terminates is reset within the same
``step`` call, and that step's ``done`` is True while the returned observation
is the fresh post-reset one (the standard vectorized-RL convention). Final
makespans are surfaced in the info dict.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from jssenv_tpu import vector
from jssenv_tpu.core.state import EnvState
from jssenv_tpu.instances import InstanceSet, InstanceSpec, get_instance


class JssVectorEnv:
    """B lockstep job-shop envs with device-resident state.

    Args:
      source: instance name/path, InstanceSpec, or InstanceSet (instances tile
        round-robin across lanes).
      num_envs: number of lanes.
      autoreset: reset finished lanes inside step() (default True).
      to_numpy: return host numpy arrays (default) or leave outputs as jax
        arrays (zero host sync until you read them).
    """

    def __init__(
        self,
        source: Union[str, InstanceSpec, InstanceSet],
        num_envs: int,
        autoreset: bool = True,
        to_numpy: bool = True,
    ):
        if isinstance(source, str):
            source = get_instance(source)
        self._source = source
        self.num_envs = int(num_envs)
        self.autoreset = autoreset
        self.to_numpy = to_numpy
        self._state = vector.make_batch(source, self.num_envs)
        self._fresh = self._state
        self._step = jax.jit(self._step_impl, static_argnames="autoreset")
        self.single_action_space_n = int(self._state.jobs_pad) + 1

    # --- functional core ---
    @staticmethod
    def _obs_of(state: EnvState):
        obs = jax.vmap(lambda s: s.observation()["real_obs"])(state)
        mask = jax.vmap(EnvState.action_mask)(state)
        return {"real_obs": obs, "action_mask": mask}

    @staticmethod
    def _step_impl(state, fresh, actions, autoreset: bool):
        new_state, tr = vector.vstep(state, actions)
        makespans = jnp.where(tr.done, new_state.time, 0)
        if autoreset:
            # select only dynamic fields — static tables are shared (see
            # vector.step_autoreset)
            picked = vector.select_lanes(
                tr.done, fresh.dynamic_fields(), new_state.dynamic_fields()
            )
            out = new_state.replace(**picked)
        else:
            out = new_state
        return out, tr, makespans

    # --- public API ---
    @property
    def state(self) -> EnvState:
        """The underlying batched EnvState (device-resident)."""
        return self._state

    def reset(self, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        del seed  # envs are deterministic; accepted for API convenience
        self._state = vector.vreset(self._state)
        return self._maybe_np(self._obs_of(self._state))

    def step(
        self, actions
    ) -> Tuple[Dict[str, np.ndarray], np.ndarray, np.ndarray, dict]:
        """actions: (B,) int array; the no-op id for each lane is its
        ``num_jobs`` (equivalently: the last mask slot maps to jobs_pad).

        Returns (obs, reward (B,) float32, done (B,) bool,
        info={"makespan": (B,) int32 — final makespan on lanes that finished
        this step, 0 elsewhere; "raw_reward": (B,) int32}).
        """
        actions = jnp.asarray(actions, jnp.int32)
        jp = self._state.jobs_pad
        actions = jnp.where(actions == jp, self._state.num_jobs, actions)
        self._state, tr, makespans = self._step(
            self._state, self._fresh, actions, autoreset=self.autoreset
        )
        obs = self._obs_of(self._state)
        info = {"makespan": makespans, "raw_reward": tr.raw_reward}
        if self.to_numpy:
            obs = self._maybe_np(obs)
            return (
                obs,
                np.asarray(jax.device_get(tr.reward)),
                np.asarray(jax.device_get(tr.done)),
                {k: np.asarray(jax.device_get(v)) for k, v in info.items()},
            )
        return obs, tr.reward, tr.done, info

    def sample_legal_actions(self, seed_or_key) -> np.ndarray:
        """Uniform-random legal action per lane (device-side)."""
        key = (
            jax.random.key(seed_or_key)
            if isinstance(seed_or_key, int)
            else seed_or_key
        )
        a = vector.random_legal_actions(key, self._state)
        return np.asarray(jax.device_get(a)) if self.to_numpy else a

    def _maybe_np(self, obs):
        if not self.to_numpy:
            return obs
        return {k: np.asarray(jax.device_get(v)) for k, v in obs.items()}
