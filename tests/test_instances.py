"""Instance-layer tests: parsing, registry, padding, serialization."""

import numpy as np
import pytest

from jssenv_tpu import instances as inst


def test_bundled_registry_complete():
    s = inst.bundled_instances()
    assert len(s) == 85
    names = set(s.names)
    for i in range(1, 81):
        assert f"ta{i:02d}" in names
    for i in range(16, 21):
        assert f"dmu{i}" in names


@pytest.mark.parametrize(
    "name,jobs,machines",
    [
        ("ta01", 15, 15),
        ("ta11", 20, 15),
        ("ta21", 20, 20),
        ("ta31", 30, 15),
        ("ta41", 30, 20),
        ("ta51", 50, 15),
        ("ta61", 50, 20),
        ("ta71", 100, 20),
        ("dmu16", 30, 20),
    ],
)
def test_bundled_dims(name, jobs, machines):
    spec = inst.get_instance(name)
    assert spec.shape == (jobs, machines)


def test_ta01_derived_scalars():
    spec = inst.get_instance("ta01")
    # values independently recomputable from the instance data
    assert spec.max_time_op == int(spec.op_dur.max())
    assert spec.sum_op == int(spec.op_dur.sum())
    assert spec.max_time_jobs == int(spec.op_dur.sum(axis=1).max())
    # every machine id appears exactly once per job (permutation property)
    for j in range(spec.num_jobs):
        assert sorted(spec.op_machine[j]) == list(range(spec.num_machines))


def test_lower_bound():
    """lower_bound() = max(machine load, job chain): recompute independently
    and pin against published optima (lb <= optimum always)."""
    for name, optimum in [("ta01", 1231), ("ta41", 2006), ("ta51", 2760)]:
        spec = inst.get_instance(name)
        lb = spec.lower_bound()
        loads = [
            int(spec.op_dur[spec.op_machine == m].sum())
            for m in range(spec.num_machines)
        ]
        chains = [int(spec.op_dur[j].sum()) for j in range(spec.num_jobs)]
        assert lb == max(max(loads), max(chains))
        assert 0 < lb <= optimum
    # ta51 (50x15) is machine-load-bound at exactly the published optimum
    assert inst.get_instance("ta51").lower_bound() == 2760


def test_parse_roundtrip():
    spec = inst.get_instance("ta05")
    spec2 = inst.parse_taillard_text(spec.to_text(), name="rt")
    assert np.array_equal(spec.op_machine, spec2.op_machine)
    assert np.array_equal(spec.op_dur, spec2.op_dur)
    assert spec2.shape == spec.shape


def test_parse_rejects_malformed():
    with pytest.raises(ValueError):
        inst.parse_taillard_text("")
    with pytest.raises(ValueError):
        inst.parse_taillard_text("2 2\n0 5 1 4\n0 5\n")  # short job line
    with pytest.raises(ValueError):
        inst.parse_taillard_text("2 2\n0 5 9 4\n0 5 1 3\n")  # machine id range
    with pytest.raises(ValueError):
        inst.parse_taillard_text("2 2\n0 5 1 -4\n0 5 1 3\n")  # negative duration
    with pytest.raises(ValueError):
        # single machine (reference asserts machines > 1, jss_env.py:94)
        inst.parse_taillard_text("1 1\n0 5\n")


def test_unknown_instance():
    with pytest.raises(FileNotFoundError):
        inst.get_instance("ta99")


def test_padding_and_stacking():
    s = inst.get_instance_set(["ta01", "ta41"])
    assert s.jobs_pad == 30 and s.machines_pad == 20
    assert list(s.num_jobs) == [15, 30]
    assert list(s.num_machines) == [15, 20]
    # padded region is zero
    assert s.op_dur[0, 15:, :].sum() == 0
    assert s.op_dur[0, :, 15:].sum() == 0
    # unpadded extraction matches the original
    spec = inst.get_instance("ta01")
    assert np.array_equal(s.spec("ta01").op_dur, spec.op_dur)


def test_subset():
    s = inst.bundled_instances().subset(["ta41", "ta42", "ta50"])
    assert s.names == ("ta41", "ta42", "ta50")
    assert len(s) == 3


def test_random_instance_generator():
    spec = inst.random_instance(10, 6, duration_range=(5, 20), seed=3)
    assert spec.shape == (10, 6)
    for j in range(10):
        assert sorted(spec.op_machine[j]) == list(range(6))  # permutation per job
    assert spec.op_dur.min() >= 5 and spec.op_dur.max() <= 20
    # deterministic per seed
    spec2 = inst.random_instance(10, 6, duration_range=(5, 20), seed=3)
    assert np.array_equal(spec.op_dur, spec2.op_dur)
    assert not np.array_equal(
        spec.op_dur, inst.random_instance(10, 6, (5, 20), seed=4).op_dur
    )
    with pytest.raises(ValueError):
        inst.random_instance(4, 4, duration_range=(0, 9))
    iset = inst.random_instance_set(5, 8, 4, seed=1)
    assert len(iset) == 5 and iset.jobs_pad == 8


def test_random_instance_runs_in_engine():
    import jax

    from jssenv_tpu import vector

    iset = inst.random_instance_set(4, 8, 5, seed=9)
    state = vector.make_batch(iset, 4)
    state, ms, _ = vector.episode_makespans(jax.random.key(0), state, max_steps=400)
    assert (np.asarray(ms) > 0).all()


def test_load_from_file(tmp_path):
    spec = inst.get_instance("ta02")
    p = tmp_path / "my_instance"
    p.write_text(spec.to_text())
    spec2 = inst.get_instance(p)
    assert np.array_equal(spec.op_dur, spec2.op_dur)
