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
    SUBLANE_U8,
    crop2d,
    interpret_mode,
    pad2d,
)
from openmp_parallel_computing_tpu.ops.grayscale import pick_strip
from openmp_parallel_computing_tpu.ops.sobel import stencil_mag


def _luma_u8(block: jax.Array) -> jax.Array:
    r = block[0].astype(jnp.int32)
    g = block[1].astype(jnp.int32)
    b = block[2].astype(jnp.int32)
    lum = (xla_ref.LUMA_FIX_R * r + xla_ref.LUMA_FIX_G * g
           + xla_ref.LUMA_FIX_B * b) >> xla_ref.LUMA_FIX_SHIFT
    # The staged pipeline stores luma as u8 (gray[] plane) before the stencil;
    # the fixed-point luma is already an exact integer in [0, 255].
    return lum.astype(jnp.float32)


def _strip_mag(up_ref, cur_ref, dn_ref, *, i, th: int, h: int, w: int,
               border: str) -> jax.Array:
    """Sobel magnitude (f32, u8-valued) for row-strip ``i`` of a planar u8
    image, luma formed in-register from the 3-view halo blocks; stencil
    shared with ``ops.sobel`` (sobel.stencil_mag)."""
    return stencil_mag(_luma_u8(up_ref[:, th - 1:th, :]),
                       _luma_u8(cur_ref[...]),
                       _luma_u8(dn_ref[:, 0:1, :]),
                       i=i, th=th, h=h, w=w, border=border)


def _edge_kernel(up_ref, cur_ref, dn_ref, out_ref, *, th: int, h: int, w: int,
                 channels: int, border: str):
    i = pl.program_id(0)
    mag = _strip_mag(up_ref, cur_ref, dn_ref, i=i, th=th, h=h, w=w,
                     border=border)
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


def _edge_poolrows_kernel(up_ref, cur_ref, dn_ref, out_ref, *, th: int,
                          s: int, h: int, w: int, lead: bool):
    i = pl.program_id(0)
    mag = _strip_mag(up_ref, cur_ref, dn_ref, i=i, th=th, h=h, w=w,
                     border="zero")
    # th/s pooled rows per strip: sum each s-row band down to a lane vector.
    pooled = jnp.stack(
        [jnp.sum(mag[k * s:(k + 1) * s], axis=0) for k in range(th // s)])
    out_ref[...] = pooled[None] if lead else pooled


@functools.partial(jax.jit, static_argnames=("s", "strip"))
def edge_pyramid_base(img: jax.Array, s: int = 16,
                      strip: int | None = None) -> jax.Array:
    """Planar (C, H, W) u8 frame -> (ceil(H/s), ceil(W/s)) f32 block-mean
    of the u8 Sobel edge map, in ONE fused Pallas kernel.

    The perception front-end of the MPC cost pyramid: grayscale -> Sobel ->
    s x s average pooling without ever materializing the full-resolution
    edge plane in HBM (the staged path writes the u8 edge image, casts it
    to f32, and reduce_windows it). Semantics are bit-exact with
    ``costs.avg_pool(edge_pipeline(img)[0].astype(f32), s)``: the pooled
    blocks are anchored at (0, 0), partial blocks zero-pad, the border is
    the pipeline's zero border, and block sums of u8-valued magnitudes are
    integers < 2^24, so f32 accumulation order cannot change the result.
    (The reference repo's pipeline stops at the edge image,
    ``monolithic/src/main_with_sobel.c:51-74``; the pooling fusion serves
    the solver's pyramid, ``models/mpc/costs.py``.)
    """
    c, h, w = img.shape
    # Strip height: 4 pooled rows per strip measured fastest on-chip at
    # 1080p (0.44 ms vs 0.79 at 2 rows / 0.61 at 8 rows / 0.64 staged —
    # results/tpu_v5e/perception_study.json): enough strips to pipeline
    # the 3-view halo streaming, small enough f32 working set. Bounded
    # below by the u8 sublane tile and above by VMEM (~8 temporaries).
    th = strip or max(4 * s, SUBLANE_U8)
    while th > s and th * max(w, LANE) * 4 * 8 > 10 * 1024 * 1024:
        th //= 2
    th = max(th, s, SUBLANE_U8)
    if th % s:
        raise ValueError(f"pool scale {s} must divide the strip {th}")
    x = pad2d(img, th, LANE if LANE % s == 0 else s * LANE)
    _, hp, wp = x.shape
    n = hp // th
    rps = th // s                              # pooled rows per strip
    spec = lambda fn: pl.BlockSpec((c, th, wp), fn, memory_space=pltpu.VMEM)
    # Mosaic requires the output block's last two dims be (8, 128)-
    # divisible or equal to the array dims; with rps % 8 != 0 the strip
    # axis gets its own leading dim (block (1, rps, wp)) instead.
    lead = rps % 8 != 0 and n > 1
    out_spec = (pl.BlockSpec((1, rps, wp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM) if lead else
                pl.BlockSpec((rps, wp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM))
    out_shape = jax.ShapeDtypeStruct(
        (n, rps, wp) if lead else (hp // s, wp), jnp.float32)
    rowsums = pl.pallas_call(
        functools.partial(_edge_poolrows_kernel, th=th, s=s, h=h, w=w,
                          lead=lead),
        grid=(n,),
        in_specs=[
            spec(lambda i: (0, jnp.maximum(i - 1, 0), 0)),
            spec(lambda i: (0, i, 0)),
            spec(lambda i: (0, jnp.minimum(i + 1, n - 1), 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret_mode(),
    )(x, x, x)
    level0 = rowsums.reshape(hp // s, wp // s, s).sum(-1) / float(s * s)
    return level0[:-(-h // s), :-(-w // s)]


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
