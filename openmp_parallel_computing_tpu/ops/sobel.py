"""Pallas TPU Sobel edge-detection kernel.

Capability twin of the reference's ``collapse(2) schedule(static)`` 2-D
stencil (``monolithic/src/sobel.c:6-25``): integer 3x3 taps on a u8 plane,
``mag = trunc(sqrtf(gx^2 + gy^2))`` clamped to 255, interior-only. Where the
reference leaves the 1-px border uninitialized (malloc'd dst), this framework
defines the border as 0.

TPU design: the image is cut into row-strips; the strip halo (one row above /
below) is obtained by passing the *same* input array through three
``BlockSpec`` views whose index maps select the previous / current / next
strip. Column neighbors are in-register shifts within the strip. All taps are
exact in f32 (values < 2^24), so the whole stencil runs on the VPU with a
single HBM read per strip per view and one write — the bandwidth-bound
optimum for a 9-point stencil without manual halo DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmp_parallel_computing_tpu.ops._tiling import (
    LANE,
    cast,
    crop2d,
    interpret_mode,
    pad2d,
)
from openmp_parallel_computing_tpu.ops.grayscale import pick_strip


def _shift_cols(x: jax.Array, dx: int) -> jax.Array:
    """Value of the neighbor at column offset ``dx`` (zero outside)."""
    if dx == 0:
        return x
    zeros = jnp.zeros_like(x[:, :1])
    if dx < 0:  # neighbor to the left: shift content right
        return jnp.concatenate([zeros, x[:, :dx]], axis=1)
    return jnp.concatenate([x[:, dx:], zeros], axis=1)


def stencil_mag(up_last: jax.Array, cur: jax.Array, dn_first: jax.Array,
                *, i, th: int, h: int, w: int, border: str) -> jax.Array:
    """Shared 3x3 Sobel stencil on an f32 row-strip with one halo row per
    side — the single implementation behind ``ops.sobel``, the fused edge
    pipeline, and the fused pyramid kernel.

    Out-of-plane neighbors are ZERO in both border modes: the clamped
    BlockSpec index maps hand the first/last strip its own rows as halo,
    so their contribution is masked here. (Without the mask,
    ``border="none"`` wrapped the strip edge rows — the documented
    zero-out-of-plane contract only held because in-tree sharded callers
    crop exactly those rows.)
    """
    n = pl.num_programs(0)
    up_last = up_last * (i > 0).astype(jnp.float32)
    dn_first = dn_first * (i < n - 1).astype(jnp.float32)

    # Rows of the logical image at y-1 / y / y+1 for each row of this strip.
    above = jnp.concatenate([up_last, cur[:-1]], axis=0)
    below = jnp.concatenate([cur[1:], dn_first], axis=0)

    gx = (-_shift_cols(above, -1) - 2.0 * _shift_cols(cur, -1)
          - _shift_cols(below, -1)
          + _shift_cols(above, 1) + 2.0 * _shift_cols(cur, 1)
          + _shift_cols(below, 1))
    gy = (_shift_cols(above, -1) + 2.0 * above + _shift_cols(above, 1)
          - _shift_cols(below, -1) - 2.0 * below - _shift_cols(below, 1))

    mag = jnp.minimum(jnp.floor(jnp.sqrt(gx * gx + gy * gy)), 255.0)

    if border == "zero":
        shape = cur.shape
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * th
        col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        interior = (row >= 1) & (row < h - 1) & (col >= 1) & (col < w - 1)
        mag = jnp.where(interior, mag, 0.0)
    return mag


def _sobel_kernel(up_ref, cur_ref, dn_ref, out_ref, *, th: int,
                  h: int, w: int, border: str):
    mag = stencil_mag(cast(up_ref[th - 1:th], jnp.float32),
                      cast(cur_ref[...], jnp.float32),
                      cast(dn_ref[0:1], jnp.float32),
                      i=pl.program_id(0), th=th, h=h, w=w, border=border)
    # Mosaic has no direct f32->u8 cast; hop through int32.
    out_ref[...] = mag.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("strip", "border"))
def sobel(gray: jax.Array, strip: int | None = None,
          border: str = "zero") -> jax.Array:
    """(H, W) u8 plane -> (H, W) u8 edge magnitude.

    ``border="zero"`` (default) zeroes the 1-px image border — the
    framework's defined replacement for the reference's uninitialized
    border. ``border="none"`` skips the mask: every row is computed as
    interior with zero-filled out-of-plane neighbors, which is what a
    spatially sharded caller wants when the plane is a halo-extended local
    shard (see ``parallel.spatial``).
    """
    h, w = gray.shape
    th = strip or pick_strip(h, w)
    x = pad2d(gray, th, LANE)
    hp, wp = x.shape
    n = hp // th

    spec = lambda fn: pl.BlockSpec((th, wp), fn, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sobel_kernel, th=th, h=h, w=w, border=border),
        grid=(n,),
        in_specs=[
            spec(lambda i: (jnp.maximum(i - 1, 0), 0)),
            spec(lambda i: (i, 0)),
            spec(lambda i: (jnp.minimum(i + 1, n - 1), 0)),
        ],
        out_specs=spec(lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint8),
        interpret=interpret_mode(),
    )(x, x, x)
    return crop2d(out, h, w)
