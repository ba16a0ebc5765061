"""Shared kernel-dispatch runner for the CLI, serving tier, and benches.

One place that knows (a) the kernel name table, (b) how to repeat a kernel
``passes`` times on device, and (c) how to spatially shard each kernel over
``devices`` mesh devices (every kernel shards: grayscale row-wise without
halos, the stencils with ppermute halo exchange). Previously this logic was
triplicated across cli/serve/bench and the devices knob silently fell back
to a single device for non-edge kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from openmp_parallel_computing_tpu import ops

KERNEL_NAMES = ("grayscale", "edge", "blur")

_SINGLE = {
    "grayscale": lambda img, passes: ops.grayscale(img, passes=passes),
    "edge": lambda img, passes: ops.edge_pipeline(img, passes=passes),
    "blur": lambda img, passes: ops.gaussian_blur(img, passes=passes),
}


@functools.lru_cache(maxsize=64)
def make_runner(kernel: str, passes: int = 1, devices: int = 1,
                orig_h: int | None = None):
    """Jitted ``run(img_chw_u8) -> img_chw_u8`` for a kernel.

    With ``devices > 1`` the frame's rows are sharded over a 1 x devices
    mesh; pad the height to a multiple of ``devices`` first (``pad_rows``)
    and pass the unpadded height as ``orig_h`` so border zeroing lands on
    the true image border. Cached per (kernel, passes, devices, orig_h).
    """
    if kernel not in _SINGLE:
        raise KeyError(f"unknown kernel {kernel!r}; one of {KERNEL_NAMES}")
    # Clamp to the attached fleet: a job asking for more devices than exist
    # (e.g. a dispatch message from a bigger deployment) degrades to what
    # this host has instead of crashing the worker into a redelivery loop.
    devices = min(devices, len(jax.devices()))
    if devices <= 1:
        base = _SINGLE[kernel]
        return jax.jit(lambda img: base(img, passes))

    from openmp_parallel_computing_tpu import parallel

    mesh = parallel.make_mesh(data=1, model=devices,
                              devices=jax.devices()[:devices])
    sharded = {
        "grayscale": parallel.sharded_grayscale,
        "edge": parallel.sharded_edge_pipeline,
        "blur": parallel.sharded_gaussian_blur,
    }[kernel]

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
