"""jssenv_tpu: TPU-native job-shop scheduling environment engine.

A ground-up JAX/XLA re-design of the JSSEnv Gym environment
(prosysscience/JSSEnv): the simulator is a pure struct-of-arrays step function
under jit/vmap stepping thousands of Taillard instances in lockstep on TPU,
with the Gym-compatible single-env wrapper, the seven dispatching rules, the
Gantt renderer and the benchmark instance suite all preserved at the API level.

Importing this package registers the ``"jss-v1"`` environment with gymnasium
(reference: JSSEnv/__init__.py:6-9), when gymnasium is installed.
"""

__version__ = "0.1.0"

from jssenv_tpu import instances, utils  # noqa: F401
from jssenv_tpu.instances import (  # noqa: F401
    InstanceSet,
    InstanceSpec,
    bundled_instances,
    get_instance,
    get_instance_set,
    load_instance_file,
    parse_taillard_text,
)

try:
    from gymnasium.envs.registration import register, registry

    if "jss-v1" not in registry:
        register(id="jss-v1", entry_point="jssenv_tpu.envs.gym_env:JssEnv")
except ImportError:  # pragma: no cover - gymnasium optional
    pass
