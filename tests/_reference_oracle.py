"""Optional import of the reference implementation as a differential oracle.

When a checkout of prosysscience/JSSEnv is available (default mount point
/root/reference), the parity tests drive it in lockstep with the new engine.
Missing optional deps of the reference (plotly) are stubbed. When no checkout
is present the parity tests are skipped — the golden-solution replays remain
the standalone correctness anchor.
"""

import os
import sys
import types

REFERENCE_PATH = os.environ.get("JSS_REFERENCE_PATH", "/root/reference")


def load_reference_env_class():
    if not os.path.isdir(REFERENCE_PATH):
        return None
    for name in ["plotly", "plotly.figure_factory", "plotly.graph_objects"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["plotly"].figure_factory = sys.modules["plotly.figure_factory"]
    if not hasattr(sys.modules["plotly.graph_objects"], "Figure"):
        sys.modules["plotly.graph_objects"].Figure = object
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        from JSSEnv.envs.jss_env import JssEnv  # noqa: E501
    except Exception:
        return None
    # importing the JSSEnv package re-registers "jss-v1" to the reference env;
    # point it back at ours so gym.make tests see the right class
    try:
        from gymnasium.envs.registration import register, registry

        registry.pop("jss-v1", None)
        register(id="jss-v1", entry_point="jssenv_tpu.envs.gym_env:JssEnv")
    except ImportError:
        pass
    return JssEnv


def reference_instance_path(name: str) -> str:
    return os.path.join(REFERENCE_PATH, "JSSEnv", "envs", "instances", name)
