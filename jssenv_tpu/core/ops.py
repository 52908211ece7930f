"""Primitive engine ops with TPU-friendly lowerings.

The engine needs three small irregular primitives over the tiny J/M axes:
per-machine segment reductions (min/any), per-job row gathers
(``op_dur[j, next_op[j]]``), and a machine-indexed scatter-any. XLA lowers
native scatter/gather on TPU to serialized updates, while the same ops
expressed as one-hot masked reductions over an extra (tiny) axis are pure
vector code on the VPU. Both lowerings are provided and behaviorally
identical; the default is chosen per backend and can be forced with
``JSS_ENGINE_LOWERING=onehot|native``.

J and M are ≤ 128 for every bundled instance, so the one-hot expansion adds at
most a (M, J) or (J, M) temporary per call — negligible next to the batch axis.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_I32_MAX = jnp.iinfo(jnp.int32).max


def _mode() -> str:
    mode = os.environ.get("JSS_ENGINE_LOWERING", "auto")
    if mode not in ("auto", "onehot", "native"):
        raise ValueError(f"bad JSS_ENGINE_LOWERING={mode}")
    if mode == "auto":
        # one-hot wins on TPU (no serialized scatters); native wins on CPU
        return "onehot" if jax.default_backend() == "tpu" else "native"
    return mode


def _widen(x: jax.Array) -> jax.Array:
    """Promote narrow integer gather results to int32 so downstream arithmetic
    is dtype-stable regardless of the (possibly compressed) table dtype."""
    if jnp.issubdtype(x.dtype, jnp.integer) and x.dtype.itemsize < 4:
        return x.astype(jnp.int32)
    return x


def row_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table: (J, M); idx: (J,) int32 in [0, M) (caller clips). Returns
    ``table[j, idx[j]]`` per row, shape (J,), int32 for integer tables."""
    if _mode() == "native":
        return _widen(jnp.take_along_axis(table, idx[:, None], axis=1)[:, 0])
    m = table.shape[1]
    onehot = idx[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
    return _widen(jnp.sum(jnp.where(onehot, table, 0), axis=1))


def lookup(vec: jax.Array, idx: jax.Array) -> jax.Array:
    """vec: (M,); idx: any int32 shape with entries in [0, M). Returns
    ``vec[idx]`` elementwise."""
    if _mode() == "native":
        return _widen(vec[idx])
    m = vec.shape[0]
    onehot = idx[..., None] == jnp.arange(m, dtype=jnp.int32)
    if vec.dtype == jnp.bool_:
        return jnp.any(onehot & vec, axis=-1)
    return _widen(jnp.sum(jnp.where(onehot, vec, 0), axis=-1))


def lookup2d_col(mat: jax.Array, row_idx: jax.Array) -> jax.Array:
    """mat: (M, J); row_idx: (J,) in [0, M). Returns out[j] = mat[row_idx[j], j]."""
    if _mode() == "native":
        return mat[row_idx, jnp.arange(mat.shape[1], dtype=jnp.int32)]
    m = mat.shape[0]
    onehot = row_idx[None, :] == jnp.arange(m, dtype=jnp.int32)[:, None]
    if mat.dtype == jnp.bool_:
        return jnp.any(onehot & mat, axis=0)
    return jnp.sum(jnp.where(onehot, mat, 0), axis=0)


def rows_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table: (J, M); idx: (J, K) in [0, M). Returns out[j, k] = table[j, idx[j, k]]."""
    if _mode() == "native":
        return _widen(jnp.take_along_axis(table, idx, axis=1))
    m = table.shape[1]
    onehot = idx[..., None] == jnp.arange(m, dtype=jnp.int32)
    return _widen(jnp.sum(jnp.where(onehot, table[:, None, :], 0), axis=-1))


def segment_min(
    seg: jax.Array, values: jax.Array, mask: jax.Array, num_segments: int
) -> jax.Array:
    """Per-segment masked min: out[m] = min over j with seg[j]==m and mask[j]
    of values[j], else INT32_MAX. seg entries are caller-clipped into range."""
    if _mode() == "native":
        return (
            jnp.full((num_segments,), _I32_MAX, jnp.int32)
            .at[seg]
            .min(jnp.where(mask, values, _I32_MAX))
        )
    onehot = seg[None, :] == jnp.arange(num_segments, dtype=jnp.int32)[:, None]
    vals = jnp.where(onehot & mask[None, :], values[None, :], _I32_MAX)
    return jnp.min(vals, axis=1)


def segment_any(seg: jax.Array, mask: jax.Array, num_segments: int) -> jax.Array:
    """Per-segment any: out[m] = any(seg[j]==m and mask[j]). seg may be
    multi-dimensional (flattened with mask)."""
    seg = seg.reshape(-1)
    mask = mask.reshape(-1)
    if _mode() == "native":
        return (
            jnp.zeros((num_segments,), jnp.int32).at[seg].max(mask.astype(jnp.int32))
            > 0
        )
    onehot = seg[None, :] == jnp.arange(num_segments, dtype=jnp.int32)[:, None]
    return jnp.any(onehot & mask[None, :], axis=1)
