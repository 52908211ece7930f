"""Config plumbing and env factory.

Provides the two integration hooks the reference exposes (``create_env`` for
Ray/RLlib class lookup, ``assign_env_config`` for attribute-style config
override — see reference JSSEnv/utils.py:5-60 for the behavioral contract),
implemented here on top of a small name->factory registry and a typed
coercion helper so new env flavors (vectorized, native-backed) can register
themselves without editing this module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, Optional, Union

import numpy as np

# ---------------------------------------------------------------------------
# Env factory registry
# ---------------------------------------------------------------------------

_ENV_REGISTRY: Dict[str, Callable[[], type]] = {}


def register_env_class(name: str, loader: Callable[[], type]) -> None:
    """Register a lazily-imported env class under ``name``.

    ``loader`` is a zero-arg callable returning the class; lazy so importing
    :mod:`jssenv_tpu.utils` never drags in jax or gymnasium.
    """
    _ENV_REGISTRY[name] = loader


def registered_env_names() -> tuple:
    return tuple(sorted(_ENV_REGISTRY))


def _load_gym_env() -> type:
    from jssenv_tpu.envs.gym_env import JssEnv

    return JssEnv


def _load_vec_env() -> type:
    from jssenv_tpu.envs.vec_env import JssVectorEnv

    return JssVectorEnv


register_env_class("jss-v1", _load_gym_env)
register_env_class("jss-vec-v1", _load_vec_env)


def create_env(config: Union[Mapping[str, Any], str], *args: Any, **kwargs: Any) -> type:
    """Resolve an env name (or a config mapping with an ``env`` key) to its
    class, for Ray/RLlib-style integration (parity with reference
    utils.py:32-60: returns the class, not an instance)."""
    name = config.get("env") if isinstance(config, Mapping) else config
    loader = _ENV_REGISTRY.get(name)
    if loader is None:
        raise NotImplementedError(f"Environment {name} not recognized.")
    return loader()


# ---------------------------------------------------------------------------
# Attribute-style config override
# ---------------------------------------------------------------------------


def _coerced(current: Any, value: Any) -> Any:
    """Coerce ``value`` to the type of an existing attribute value.

    Arrays pass through unchanged; everything else goes through the current
    value's constructor (so e.g. an int default turns "3" into 3) — matching
    the reference's typed-override behavior (utils.py:21-29).
    """
    if current is None or isinstance(current, np.ndarray):
        return value
    return type(current)(value)


def assign_env_config(obj: Any, overrides: Mapping[str, Any]) -> None:
    """Apply ``overrides`` as attributes on ``obj``, then re-apply any nested
    ``obj.env_config`` mapping with type coercion against existing defaults."""
    for key, value in overrides.items():
        setattr(obj, key, value)
    nested = getattr(obj, "env_config", None)
    if not nested:
        return
    for key, value in nested.items():
        if hasattr(obj, key):
            value = _coerced(getattr(obj, key), value)
        setattr(obj, key, value)


# ---------------------------------------------------------------------------
# Typed run settings (TPU-side knobs the reference keeps implicit)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RunSettings:
    """One typed bundle for the knobs scattered across env_config dicts.

    ``instance``: bundled instance name or Taillard file path.
    ``batch_size``: env lanes per chip for vectorized rollouts.
    ``engine``: "auto" | "native" | "jax" for the single-env gym wrapper.
    ``rule_seed``: seed for the rules' 10% exploratory no-op (None = greedy).
    ``mesh_shape``: optional (dp, mp) device mesh shape for scale-out.
    """

    instance: str = "ta80"
    batch_size: int = 4096
    engine: str = "auto"
    rule_seed: Optional[int] = None
    mesh_shape: Optional[tuple] = None

    def env_config(self) -> Dict[str, Any]:
        """Render as the env_config dict the gym wrapper consumes."""
        cfg: Dict[str, Any] = {"instance_path": self.instance, "engine": self.engine}
        if self.rule_seed is not None:
            cfg["rule_seed"] = self.rule_seed
        return cfg

    @classmethod
    def from_mapping(cls, mapping: Mapping[str, Any]) -> "RunSettings":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in mapping.items() if k in fields})
