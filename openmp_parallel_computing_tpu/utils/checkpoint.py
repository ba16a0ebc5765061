"""Checkpoint / resume.

The reference has no checkpointing at all (SURVEY.md §5: the only persistent
state is the MinIO volume; job metadata dies with the processes). For a
production MPC engine this subsystem persists:

- **solver state** — warm-start control sequences + duals per scenario
  stream, so a restarted controller resumes from the last solution instead
  of cold-starting the ADMM/iLQR iteration;
- **dispatch state** — the durable queue already persists jobs on disk
  (``dispatch.queue``); this module adds atomic snapshot/restore of
  arbitrary pytrees for everything else (configs, RNG keys, metrics).

Format: one .npz per checkpoint with a JSON treedef header — dependency-free
and fast for the small states involved; safe to read on any host. Writes are
atomic (tmp + rename).
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

import jax
import numpy as np


def save(path: str | os.PathLike, tree) -> None:
    """Atomically write a pytree of arrays/scalars to ``path`` (.npz).

    Handles ``None`` subtrees (restored as ``None``) and typed PRNG keys
    (persisted via ``jax.random.key_data`` and re-wrapped on restore).
    """
    leaves: list = []
    spec = _treedef_to_spec(tree, leaves)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __treedef__=np.frombuffer(
                json.dumps(spec).encode(), dtype=np.uint8),
                **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def restore(path: str | os.PathLike):
    """Read a pytree written by ``save``; returns (numpy-leaved) pytree."""
    with np.load(path) as data:
        spec = json.loads(bytes(data["__treedef__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(_count_leaves(spec))]
    return _rebuild(spec, iter(leaves))


def latest(directory: str | os.PathLike, prefix: str = "ckpt_"):
    """Most recent checkpoint path in ``directory`` (or None)."""
    d = Path(directory)
    if not d.is_dir():
        return None
    paths = sorted(d.glob(f"{prefix}*.npz"))
    return paths[-1] if paths else None


# -- minimal JSON-able pytree spec (dict/list/tuple/leaf/none/key) ----------

def _is_typed_key(x) -> bool:
    return (isinstance(x, jax.Array)
            and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key))


def _treedef_to_spec(tree, leaves: list):
    """Build the JSON spec while collecting leaf arrays into ``leaves``.

    ``None`` emits a spec node that consumes no leaf slot; typed PRNG keys
    are stored as their raw key data plus the impl name.
    """
    if tree is None:
        return {"t": "none"}
    if isinstance(tree, dict):
        keys = sorted(tree.keys())
        return {"t": "dict", "k": keys,
                "c": [_treedef_to_spec(tree[k], leaves) for k in keys]}
    if isinstance(tree, (list, tuple)):
        kind = "list" if isinstance(tree, list) else "tuple"
        if hasattr(tree, "_fields"):  # NamedTuple
            return {"t": "dict", "k": list(tree._fields),
                    "c": [_treedef_to_spec(v, leaves) for v in tree]}
        return {"t": kind,
                "c": [_treedef_to_spec(v, leaves) for v in tree]}
    if _is_typed_key(tree):
        leaves.append(jax.random.key_data(tree))
        return {"t": "key", "impl": str(jax.random.key_impl(tree))}
    leaves.append(tree)
    return {"t": "leaf"}


def _count_leaves(spec) -> int:
    if spec["t"] in ("leaf", "key"):
        return 1
    if spec["t"] == "none":
        return 0
    return sum(_count_leaves(c) for c in spec["c"])


def _rebuild(spec, leaves):
    if spec["t"] == "leaf":
        return next(leaves)
    if spec["t"] == "key":
        return jax.random.wrap_key_data(jnp_asarray(next(leaves)),
                                        impl=spec["impl"])
    if spec["t"] == "none":
        return None
    children = [_rebuild(c, leaves) for c in spec["c"]]
    if spec["t"] == "dict":
        return dict(zip(spec["k"], children))
    if spec["t"] == "tuple":
        return tuple(children)
    return children


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
