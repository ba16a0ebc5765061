"""Kernel registry + shared dispatch runner for every surface.

One place that knows (a) the kernel name table, (b) how to repeat a kernel
``passes`` times on device, and (c) how to spatially shard each kernel over
``devices`` mesh devices (every built-in shards: grayscale row-wise without
halos, the stencils with ppermute halo exchange).

The registry is the framework's **algorithm plug-in contract** — the
capability twin of the reference's add-a-service recipe
(``event-driven/README.md:57-105``, where a new algorithm means a new C
program + worker + compose entry + frontend action). Here one
``register_kernel`` call makes a new op servable through every tier at
once: the CLI (``--kernel``), the HTTP service (``POST /<name>``), the
queue worker, and the frontend's kernel ``<select>`` all consult this
table; no framework file needs editing. See docs/EXTENDING.md for the
recipe.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from openmp_parallel_computing_tpu import ops


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    """A registered image kernel.

    ``fn(img_chw, passes) -> img_chw`` runs on one device; ``sharded``
    (optional) is ``(img_chw, mesh, orig_h=None) -> img_chw`` running
    inside ``shard_map`` with the row axis sharded over the mesh's model
    axis — provide it to honor the devices knob, otherwise devices>1
    degrades to the single-device path.
    """

    name: str
    fn: Callable
    sharded: Callable | None = None


_REGISTRY: dict[str, KernelSpec] = {}


def register_kernel(name: str, fn: Callable,
                    sharded: Callable | None = None,
                    overwrite: bool = False) -> KernelSpec:
    """Register an image kernel under ``name`` for every serving surface.

    Raises on duplicate names unless ``overwrite`` (protects the built-in
    table from accidental shadowing).
    """
    if not overwrite and name in _REGISTRY:
        raise ValueError(f"kernel {name!r} already registered")
    spec = KernelSpec(name=name, fn=fn, sharded=sharded)
    _REGISTRY[name] = spec
    make_runner.cache_clear()  # a re-registration must not serve stale jits
    return spec


def unregister_kernel(name: str) -> None:
    _REGISTRY.pop(name, None)
    make_runner.cache_clear()


def kernel_names() -> tuple[str, ...]:
    """Names of all registered kernels (built-ins first)."""
    return tuple(_REGISTRY)


def _register_builtins() -> None:
    from openmp_parallel_computing_tpu import parallel

    register_kernel(
        "grayscale", lambda img, passes: ops.grayscale(img, passes=passes),
        sharded=parallel.sharded_grayscale)
    register_kernel(
        "edge", lambda img, passes: ops.edge_pipeline(img, passes=passes),
        sharded=parallel.sharded_edge_pipeline)
    register_kernel(
        "blur", lambda img, passes: ops.gaussian_blur(img, passes=passes),
        sharded=parallel.sharded_gaussian_blur)


# Legacy alias: the built-in names as a tuple (pre-registry public surface).
KERNEL_NAMES = ("grayscale", "edge", "blur")


@functools.lru_cache(maxsize=64)
def make_runner(kernel: str, passes: int = 1, devices: int = 1,
                orig_h: int | None = None):
    """Jitted ``run(img_chw_u8) -> img_chw_u8`` for a registered kernel.

    With ``devices > 1`` the frame's rows are sharded over a 1 x devices
    mesh; pad the height to a multiple of ``devices`` first (``pad_rows``)
    and pass the unpadded height as ``orig_h`` so border zeroing lands on
    the true image border. Cached per (kernel, passes, devices, orig_h).
    """
    spec = _REGISTRY.get(kernel)
    if spec is None:
        raise KeyError(
            f"unknown kernel {kernel!r}; one of {kernel_names()}")
    # Clamp to the attached fleet: a job asking for more devices than exist
    # (e.g. a dispatch message from a bigger deployment) degrades to what
    # this host has instead of crashing the worker into a redelivery loop.
    devices = min(devices, len(jax.devices()))
    if devices <= 1 or spec.sharded is None:
        base = spec.fn
        return jax.jit(lambda img: base(img, passes))

    from openmp_parallel_computing_tpu import parallel

    mesh = parallel.make_mesh(data=1, model=devices,
                              devices=jax.devices()[:devices])
    sharded = spec.sharded

    @jax.jit
    def run(img):
        return jax.lax.fori_loop(
            0, passes, lambda _, x: sharded(x, mesh, orig_h=orig_h), img)

    return run


def pad_rows(img: jax.Array, devices: int) -> tuple[jax.Array, int]:
    """Zero-pad the row axis to a multiple of ``devices``; returns
    (padded, original_height)."""
    h = img.shape[1]
    pad = (-h) % max(devices, 1)
    if pad:
        img = jnp.pad(jnp.asarray(img), ((0, 0), (0, pad), (0, 0)))
    return img, h


_register_builtins()
