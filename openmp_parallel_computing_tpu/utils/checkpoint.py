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
    """Atomically write a pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __treedef__=np.frombuffer(
                json.dumps(_treedef_to_spec(tree)).encode(), dtype=np.uint8),
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


# -- minimal JSON-able pytree spec (dict/list/tuple/leaf) -------------------

def _treedef_to_spec(tree):
    if isinstance(tree, dict):
        keys = sorted(tree.keys())  # jax.tree flattens dicts in sorted order
        return {"t": "dict", "k": keys,
                "c": [_treedef_to_spec(tree[k]) for k in keys]}
    if isinstance(tree, (list, tuple)):
        kind = "list" if isinstance(tree, list) else "tuple"
        if hasattr(tree, "_fields"):  # NamedTuple
            return {"t": "dict", "k": list(tree._fields),
                    "c": [_treedef_to_spec(v) for v in tree]}
        return {"t": kind, "c": [_treedef_to_spec(v) for v in tree]}
    return {"t": "leaf"}


def _count_leaves(spec) -> int:
    if spec["t"] == "leaf":
        return 1
    return sum(_count_leaves(c) for c in spec["c"])


def _rebuild(spec, leaves):
    if spec["t"] == "leaf":
        return next(leaves)
    children = [_rebuild(c, leaves) for c in spec["c"]]
    if spec["t"] == "dict":
        return dict(zip(spec["k"], children))
    if spec["t"] == "tuple":
        return tuple(children)
    return children
