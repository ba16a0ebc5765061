"""Pallas TPU reduction kernels.

Capability twins of the reference's OpenMP reduction clauses:

- per-channel sum/mean — ``reduction(+:count1,count2,count3)`` in
  ``old/parallel_avg_pixel.c:14-31``;
- channel-mean grayscale with fused min/max — ``reduction(min:...)
  reduction(max:...)`` in ``old/parallel_to_grayscale.c:7-38``.

TPU design: the grid walks row-strips; every step reduces its strip down the
row axis into a per-lane partial vector held in a VMEM output block that all
grid steps revisit (the Pallas accumulation idiom — initialize at step 0,
combine thereafter). The final cross-lane reduction happens outside the
kernel in XLA. Across devices these compose with ``jax.lax.psum/pmin/pmax``
(see ``parallel.collectives``).
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
    interpret_mode,
    pad2d,
)
from openmp_parallel_computing_tpu.ops.grayscale import pick_strip


def _channel_sum_kernel(img_ref, out_ref):
    i = pl.program_id(0)
    part = jnp.sum(cast(img_ref[...], jnp.float32), axis=1)  # (C, W)

    @pl.when(i == 0)
    def _():
        out_ref[...] = part

    @pl.when(i != 0)
    def _():
        out_ref[...] = out_ref[...] + part


@jax.jit
def channel_sum(img: jax.Array) -> jax.Array:
    """Planar (C, H, W) -> (C,) float32 per-channel sum."""
    c, h, w = img.shape
    th = pick_strip(h, w)
    x = pad2d(img, th, LANE)  # zero padding does not affect the sum
    _, hp, wp = x.shape
    lanes = pl.pallas_call(
        _channel_sum_kernel,
        grid=(hp // th,),
        in_specs=[pl.BlockSpec((c, th, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, wp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, wp), jnp.float32),
        interpret=interpret_mode(),
    )(x)
    return jnp.sum(lanes, axis=-1)


def channel_mean(img: jax.Array) -> jax.Array:
    """Planar (C, H, W) -> (C,) float32 per-channel mean."""
    c, h, w = img.shape
    return channel_sum(img) / jnp.float32(h * w)


def _gray_minmax_kernel(img_ref, gray_ref, min_ref, max_ref, *, th: int,
                        h: int, w: int):
    i = pl.program_id(0)
    s = (img_ref[0].astype(jnp.int32) + img_ref[1].astype(jnp.int32)
         + img_ref[2].astype(jnp.int32))
    gray = s // 3
    gray_ref[0] = gray
    gray_ref[1] = gray
    gray_ref[2] = gray

    # Mask padding so it cannot win the min/max race.
    shape = gray.shape
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * th
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    valid = (row < h) & (col < w)
    gmin = jnp.min(jnp.where(valid, gray, 256), axis=0)  # (W,)
    gmax = jnp.max(jnp.where(valid, gray, -1), axis=0)

    @pl.when(i == 0)
    def _():
        min_ref[0] = gmin
        max_ref[0] = gmax

    @pl.when(i != 0)
    def _():
        min_ref[0] = jnp.minimum(min_ref[0], gmin)
        max_ref[0] = jnp.maximum(max_ref[0], gmax)


@jax.jit
def grayscale_mean_minmax(img: jax.Array):
    """Channel-mean grayscale + fused global min/max.

    Planar (C, H, W) u8 -> ((3, H, W) int32 gray image, min, max) matching
    the reference's integer (r+g+b)/3 semantics.
    """
    c, h, w = img.shape
    th = pick_strip(h, w)
    x = pad2d(img, th, LANE)
    _, hp, wp = x.shape
    gray, mins, maxs = pl.pallas_call(
        functools.partial(_gray_minmax_kernel, th=th, h=h, w=w),
        grid=(hp // th,),
        in_specs=[pl.BlockSpec((c, th, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((3, th, wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((1, wp), jnp.int32),
            jax.ShapeDtypeStruct((1, wp), jnp.int32),
        ),
        interpret=interpret_mode(),
    )(x)
    return gray[:, :h, :w], jnp.min(mins), jnp.max(maxs)
