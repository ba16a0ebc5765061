"""Fused grayscale -> extract -> Sobel -> broadcast pipeline (one Pallas kernel).

The reference runs this as four serial OpenMP regions per pass with two extra
1 B/px planes bouncing through host RAM (``monolithic/src/main_with_sobel.c:
51-74``). On TPU the whole pipeline is a single kernel: each row-strip of the
planar RGB(A) image is read once from HBM, the luma plane is formed in VMEM
(truncated to u8 exactly where the staged C pipeline materializes ``gray[]``),
the Sobel stencil runs in-register, and the edge magnitude is broadcast back
to the RGB channels of the output strip — zero intermediate HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmp_parallel_computing_tpu.ops import xla_ref
from openmp_parallel_computing_tpu.ops._tiling import (
    LANE,
    crop2d,
    interpret_mode,
    pad2d,
)
from openmp_parallel_computing_tpu.ops.grayscale import pick_strip
from openmp_parallel_computing_tpu.ops.sobel import _shift_cols


def _luma_u8(block: jax.Array) -> jax.Array:
    r = block[0].astype(jnp.int32)
    g = block[1].astype(jnp.int32)
    b = block[2].astype(jnp.int32)
    lum = (xla_ref.LUMA_FIX_R * r + xla_ref.LUMA_FIX_G * g
           + xla_ref.LUMA_FIX_B * b) >> xla_ref.LUMA_FIX_SHIFT
    # The staged pipeline stores luma as u8 (gray[] plane) before the stencil;
    # the fixed-point luma is already an exact integer in [0, 255].
    return lum.astype(jnp.float32)


def _edge_kernel(up_ref, cur_ref, dn_ref, out_ref, *, th: int, h: int, w: int,
                 channels: int, border: str):
    i = pl.program_id(0)
    cur = _luma_u8(cur_ref[...])
    up_last = _luma_u8(up_ref[:, th - 1:th, :])
    dn_first = _luma_u8(dn_ref[:, 0:1, :])

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
    # Mosaic has no direct f32->u8 cast; hop through int32.
    edge = mag.astype(jnp.int32).astype(jnp.uint8)

    out_ref[0] = edge
    out_ref[1] = edge
    out_ref[2] = edge
    if channels > 3:
        out_ref[3] = cur_ref[3]


def _edge_padded(x: jax.Array, th: int, h: int, w: int,
                 border: str) -> jax.Array:
    c, hp, wp = x.shape
    n = hp // th
    spec = lambda fn: pl.BlockSpec((c, th, wp), fn, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_edge_kernel, th=th, h=h, w=w, channels=c,
                          border=border),
        grid=(n,),
        in_specs=[
            spec(lambda i: (0, jnp.maximum(i - 1, 0), 0)),
            spec(lambda i: (0, i, 0)),
            spec(lambda i: (0, jnp.minimum(i + 1, n - 1), 0)),
        ],
        out_specs=spec(lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.uint8),
        interpret=interpret_mode(),
    )(x, x, x)


@functools.partial(jax.jit, static_argnames=("strip", "border", "passes"))
def edge_pipeline(img: jax.Array, strip: int | None = None,
                  border: str = "zero", passes: int = 1) -> jax.Array:
    """Planar (C, H, W) u8 -> (C, H, W) u8 Sobel-edge image, fully fused.

    ``border`` as in ``ops.sobel``: "zero" masks the image border, "none"
    computes every row (for halo-extended shards). ``passes`` repeats the
    whole pipeline on-device with padding hoisted out of the loop
    (``main_with_sobel.c:51-74`` reruns all four stages per pass likewise).
    """
    c, h, w = img.shape
    th = strip or pick_strip(h, w)
    x = pad2d(img, th, LANE)
    if passes == 1:
        out = _edge_padded(x, th, h, w, border)
    else:
        out = jax.lax.fori_loop(
            0, passes, lambda _, v: _edge_padded(v, th, h, w, border), x)
    return crop2d(out, h, w)
