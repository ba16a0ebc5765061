"""Collective-traffic introspection: what actually crosses the mesh.

``collective_footprint`` walks the jaxpr of a (jitted or plain) function
and inventories every collective primitive — psum / pmax / pmin / pmean's
lowering, ppermute, all_gather, reduce_scatter, all_to_all — with the
payload bytes and the mesh axes it reduces over. This turns the pod
scaling story from prose into numbers: the DCN efficiency model
(``bench.pod_model``) is built from the MEASURED per-step payload this
reports, not from reading the source.

The reference has no analogue (its cross-worker traffic is whatever
RabbitMQ/MinIO move, unmeasured); the closest is the thread-count sweep's
implicit shared-memory traffic (``monolithic/scripts/
bench_and_plot_monolithic.sh:34-46``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import numpy as np

# jaxpr primitive name -> canonical label. psum arrives as `psum` (inside
# shard_map) or `psum2`/`allreduce`-flavored internals depending on
# version; match by prefix below.
_COLLECTIVES = ("psum", "pmax", "pmin", "ppermute", "all_gather",
                "all_to_all", "reduce_scatter", "pbroadcast")


@dataclasses.dataclass(frozen=True)
class Collective:
    """One collective op found in the traced program."""

    primitive: str          # e.g. "psum", "ppermute"
    axes: tuple[str, ...]   # mesh axis names it communicates over
    shape: tuple[int, ...]  # per-device payload shape
    dtype: str
    bytes: int              # per-device payload bytes
    count: int = 1          # static multiplicity (scan length etc.)


def _axes_of(params: dict[str, Any]) -> tuple[str, ...]:
    for key in ("axes", "axis_name", "axis_index_groups"):
        if key in params and params[key] is not None:
            ax = params[key]
            if isinstance(ax, (tuple, list)):
                flat = []
                for a in ax:
                    if isinstance(a, (tuple, list)):
                        flat.extend(a)
                    else:
                        flat.append(a)
                return tuple(str(a) for a in flat)
            return (str(ax),)
    return ()


def _walk(jaxpr, out: list[Collective], mult: int) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if any(name == c or name.startswith(c + "_") or name.startswith(c)
               for c in _COLLECTIVES):
            for var in eqn.invars:
                aval = getattr(var, "aval", None)
                if aval is None or not hasattr(aval, "shape"):
                    continue
                nbytes = int(np.prod(aval.shape, dtype=np.int64)
                             * np.dtype(aval.dtype).itemsize)
                out.append(Collective(
                    primitive=name, axes=_axes_of(eqn.params),
                    shape=tuple(int(s) for s in aval.shape),
                    dtype=str(np.dtype(aval.dtype)), bytes=nbytes,
                    count=mult))
        # Recurse into sub-jaxprs (pjit, shard_map, scan, cond, ...),
        # scaling multiplicity by static trip counts where known.
        inner_mult = mult
        if name == "scan":
            inner_mult = mult * int(eqn.params.get("length", 1))
        elif name == "while":
            inner_mult = mult  # trip count unknown; count once
        for key in ("jaxpr", "call_jaxpr", "cond_jaxpr", "body_jaxpr"):
            sub = eqn.params.get(key)
            if sub is not None:
                _walk(getattr(sub, "jaxpr", sub), out, inner_mult)
        for key in ("branches",):
            for sub in eqn.params.get(key, ()):  # cond: count each once
                _walk(getattr(sub, "jaxpr", sub), out, mult)


def collective_footprint(fn: Callable, *args, **kwargs) -> list[Collective]:
    """Trace ``fn(*args, **kwargs)`` and inventory its collectives.

    Returns one :class:`Collective` per (op, operand) occurrence, with
    ``count`` multiplied through statically-known ``lax.scan`` lengths.
    Works on jitted functions (recurses through the pjit call)."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    out: list[Collective] = []
    _walk(jaxpr.jaxpr, out, 1)
    return out


def footprint_summary(cols: list[Collective]) -> dict[str, Any]:
    """Aggregate a footprint into per-axis byte totals.

    Returns ``{"per_axis": {axis: bytes}, "ops": [row...], "total_bytes":
    N}`` where bytes are per-device per-call (count folded in)."""
    per_axis: dict[str, int] = {}
    rows = []
    total = 0
    for c in cols:
        b = c.bytes * c.count
        total += b
        for ax in (c.axes or ("<unnamed>",)):
            per_axis[ax] = per_axis.get(ax, 0) + b
        rows.append({"op": c.primitive, "axes": list(c.axes),
                     "shape": list(c.shape), "dtype": c.dtype,
                     "bytes": c.bytes, "count": c.count})
    return {"per_axis": per_axis, "ops": rows, "total_bytes": total}
