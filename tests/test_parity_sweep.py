"""Instance-suite parity sweep vs the reference (when mounted).

Default run: one representative per instance family (size class) with full
stepwise state comparison. Slow run (``-m slow`` or ``-m ''``): every one of
the 85 bundled instances — the BASELINE "bit-exact makespans on ta01-ta80"
claim, checked not just on makespans but on the entire state trajectory.
"""

import pytest

from jssenv_tpu import instances as inst

from _reference_oracle import load_reference_env_class
from test_parity import run_parity_episode

RefEnv = load_reference_env_class()

pytestmark = pytest.mark.skipif(
    RefEnv is None, reason="reference checkout not available"
)

FAMILY_REPRESENTATIVES = [
    "ta01",   # 15x15
    "ta11",   # 20x15
    "ta21",   # 20x20
    "ta31",   # 30x15
    "ta41",   # 30x20
    "ta51",   # 50x15
    "ta61",   # 50x20
    "ta71",   # 100x20
    "dmu16",  # 30x20 (Demirkol)
]


@pytest.mark.parametrize("name", FAMILY_REPRESENTATIVES)
def test_family_representative_parity(name):
    run_parity_episode(name, seed=hash(name) % 2**31)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(inst.instance_names()))
def test_full_suite_parity(name):
    run_parity_episode(name, seed=hash(name) % 2**31)
