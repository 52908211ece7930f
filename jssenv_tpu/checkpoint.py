"""Checkpoint / resume: any engine or learner pytree to disk and back.

The reference has no checkpoint subsystem, but its state is trivially
serializable (SURVEY.md §5.4). Here the entire simulator/train state IS one
pytree of arrays, so checkpointing is a flat named-array save. Two backends:

* ``save``/``load`` — dependency-free ``numpy.savez`` of the flattened pytree
  (path-keyed), suitable for single-host snapshots;
* ``save_orbax``/``load_orbax`` — orbax-checkpoint for sharded/multi-host
  state when orbax is available.

``load`` restores INTO a template pytree (same treedef), which re-establishes
dtypes, shapes and any sharding of the template.
"""

from __future__ import annotations

import contextlib
import os
import tempfile
from typing import Any

import jax
import numpy as np


def _is_key(x: Any) -> bool:
    """True for typed PRNG key arrays (which numpy cannot serialize)."""
    try:
        return jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
    except (AttributeError, TypeError):
        return False


def _unkey(x: Any) -> Any:
    """Typed PRNG keys -> raw uint32 key data (save side)."""
    return jax.random.key_data(x) if _is_key(x) else x


def _flatten_with_names(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names = []
    for path, _ in flat:
        names.append(jax.tree_util.keystr(path))
    return names, [leaf for _, leaf in flat], treedef


def save(path: str, tree: Any) -> None:
    """Save a pytree of arrays as one compressed npz — atomically.

    The file is written to ``<path>.tmp`` and renamed into place, so a crash
    (or SIGKILL — tests/test_aux.py's fault-injection test) mid-save can
    never leave a torn checkpoint at ``path``: either the old complete file
    or the new complete file is there.

    ``numpy.savez`` appends ``.npz`` to extension-less paths; normalize here so
    ``save(p)`` / ``load(p)`` round-trip for any ``p``.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    names, leaves, _ = _flatten_with_names(tree)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(_unkey(l))) for i, l in enumerate(leaves)}
    arrays["__names__"] = np.asarray(names)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # unique temp name in the destination dir: concurrent savers to the same
    # path never interleave into one tmp file, and a kill leaves at most an
    # identifiable stray (ADVICE r4)
    fd, tmp = tempfile.mkstemp(
        prefix=os.path.basename(path) + ".tmp.",
        dir=os.path.dirname(os.path.abspath(path)),
    )
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
        raise


def load(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save`` into the structure (and device
    placement) of ``template``."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    names_t, leaves_t, treedef = _flatten_with_names(template)
    with np.load(path, allow_pickle=False) as z:
        names_s = [str(n) for n in z["__names__"]]
        if names_s != names_t:
            raise ValueError(
                "checkpoint structure mismatch: "
                f"saved {len(names_s)} leaves, template {len(names_t)}"
            )
        new_leaves = []
        for i, (tmpl, name) in enumerate(zip(leaves_t, names_t)):
            arr = z[f"leaf_{i}"]
            if _is_key(tmpl):
                # re-wrap raw key data with the template's PRNG impl; place it
                # onto the template's sharding like any other leaf (a sharded
                # TrainState restore must not leave the rng key unplaced under
                # multi-controller — ADVICE r4)
                key = jax.random.wrap_key_data(
                    jax.numpy.asarray(arr),
                    impl=jax.random.key_impl(tmpl),
                )
                if hasattr(tmpl, "sharding"):
                    key = jax.device_put(key, tmpl.sharding)
                new_leaves.append(key)
            elif hasattr(tmpl, "sharding"):
                new_leaves.append(
                    jax.device_put(arr.astype(tmpl.dtype), tmpl.sharding)
                )
            else:
                new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_orbax(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def load_orbax(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
