"""Tiling / padding helpers shared by the Pallas kernels.

TPU VPU lanes are (8, 128) for f32 and (32, 128) for u8; every kernel in
``ops`` works on 2-D row-strips of width padded to a multiple of 128 so that
blocks map cleanly onto vector registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128  # last-dim tile for every dtype
SUBLANE_F32 = 8
SUBLANE_U8 = 32

# Default row-strip height for stencil kernels. 256 rows x 2048 cols f32
# = 2 MiB per buffered block; with 3 shifted input views + double buffering
# this stays well under the ~16 MiB VMEM budget.
DEFAULT_STRIP = 256


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad2d(x: jax.Array, th: int, tw: int = LANE) -> jax.Array:
    """Zero-pad the trailing two dims of ``x`` up to multiples of (th, tw)."""
    h, w = x.shape[-2], x.shape[-1]
    ph, pw = round_up(h, th) - h, round_up(w, tw) - w
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(x, pad)


def crop2d(x: jax.Array, h: int, w: int) -> jax.Array:
    if x.shape[-2] == h and x.shape[-1] == w:
        return x
    return x[..., :h, :w]


def cast(x: jax.Array, dtype) -> jax.Array:
    """dtype cast that stays within Mosaic's supported conversions.

    Mosaic (the Pallas TPU compiler) has no direct u8<->f32 conversion;
    route narrow integer types through int32.
    """
    if x.dtype == dtype:
        return x
    if jnp.issubdtype(x.dtype, jnp.integer) and x.dtype.itemsize < 4 \
            and not jnp.issubdtype(dtype, jnp.integer):
        x = x.astype(jnp.int32)
    elif jnp.issubdtype(dtype, jnp.integer) and jnp.dtype(dtype).itemsize < 4 \
            and not jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.int32).astype(dtype)
    return x.astype(dtype)


@functools.cache
def on_cpu() -> bool:
    """True when the default backend is CPU — Pallas TPU kernels then run in
    interpret mode (used by the test suite on a virtual device mesh)."""
    return jax.default_backend() == "cpu"


def interpret_mode() -> bool:
    return on_cpu()
