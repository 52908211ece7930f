"""Config utilities and Ray-style env factory (reference: JSSEnv/utils.py)."""

from typing import Any, Dict, Type, Union

import numpy as np


def assign_env_config(obj: Any, kwargs: Dict[str, Any]) -> None:
    """Assign configuration entries as attributes, with type coercion based on
    existing attribute types and support for a nested ``env_config`` dict
    (reference utils.py:5-29)."""
    for key, value in kwargs.items():
        setattr(obj, key, value)
    if hasattr(obj, "env_config"):
        for key, value in obj.env_config.items():
            if hasattr(obj, key):
                current = getattr(obj, key)
                if isinstance(current, np.ndarray):
                    setattr(obj, key, value)
                else:
                    setattr(obj, key, type(current)(value))
            else:
                setattr(obj, key, value)


def create_env(config: Union[Dict[str, Any], str], *args: Any, **kwargs: Any) -> Type:
    """Map an env name to its class for Ray/RLlib-style integration
    (reference utils.py:32-60)."""
    env_name = config["env"] if isinstance(config, dict) else config
    if env_name == "jss-v1":
        from jssenv_tpu.envs.gym_env import JssEnv as env
    else:
        raise NotImplementedError(f"Environment {env_name} not recognized.")
    return env
