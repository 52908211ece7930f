"""Both lowerings of the engine primitives must agree exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from jssenv_tpu.core import ops


@pytest.fixture(autouse=True)
def _clear_mode(monkeypatch):
    monkeypatch.delenv("JSS_ENGINE_LOWERING", raising=False)


def _both(monkeypatch, fn):
    monkeypatch.setenv("JSS_ENGINE_LOWERING", "native")
    a = np.asarray(fn())
    monkeypatch.setenv("JSS_ENGINE_LOWERING", "onehot")
    b = np.asarray(fn())
    assert np.array_equal(a, b), f"native={a} onehot={b}"
    return a


def test_row_gather(monkeypatch):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 100, (7, 5)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 5, (7,)), jnp.int32)
    out = _both(monkeypatch, lambda: ops.row_gather(table, idx))
    assert out[2] == int(table[2, idx[2]])


def test_rows_gather(monkeypatch):
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.integers(0, 100, (6, 4)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 4, (6, 3)), jnp.int32)
    _both(monkeypatch, lambda: ops.rows_gather(table, idx))


def test_lookup_int_and_bool(monkeypatch):
    rng = np.random.default_rng(2)
    vec = jnp.asarray(rng.integers(0, 50, (9,)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 9, (4, 5)), jnp.int32)
    _both(monkeypatch, lambda: ops.lookup(vec, idx))
    bvec = jnp.asarray(rng.integers(0, 2, (9,)).astype(bool))
    _both(monkeypatch, lambda: ops.lookup(bvec, idx))


def test_lookup2d_col(monkeypatch):
    rng = np.random.default_rng(3)
    mat = jnp.asarray(rng.integers(0, 2, (5, 8)).astype(bool))
    ridx = jnp.asarray(rng.integers(0, 5, (8,)), jnp.int32)
    out = _both(monkeypatch, lambda: ops.lookup2d_col(mat, ridx))
    assert out[3] == bool(mat[ridx[3], 3])


def test_segment_min_any(monkeypatch):
    rng = np.random.default_rng(4)
    seg = jnp.asarray(rng.integers(0, 6, (12,)), jnp.int32)
    vals = jnp.asarray(rng.integers(0, 99, (12,)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (12,)).astype(bool))
    mins = _both(monkeypatch, lambda: ops.segment_min(seg, vals, mask, 6))
    anys = _both(monkeypatch, lambda: ops.segment_any(seg, mask, 6))
    for m in range(6):
        sel = (np.asarray(seg) == m) & np.asarray(mask)
        expected = np.asarray(vals)[sel].min() if sel.any() else np.iinfo(np.int32).max
        assert mins[m] == expected
        assert anys[m] == sel.any()


def test_bad_mode(monkeypatch):
    monkeypatch.setenv("JSS_ENGINE_LOWERING", "wat")
    with pytest.raises(ValueError):
        ops.row_gather(jnp.zeros((2, 2), jnp.int32), jnp.zeros((2,), jnp.int32))
