"""Pallas TPU grayscale kernel.

Capability twin of the reference's flat OpenMP pixel loop
(``monolithic/src/parallel_to_grayscale.c:5-17``): BT.601 luma written to
all three RGB channels, alpha passed through. The reference computes the
luma in f32 and C-casts to u8; this kernel computes it in FIXED-POINT
integer arithmetic instead — ``(19595*r + 38470*g + 7471*b) >> 16`` with
weights ``round(w * 2**16)`` (``xla_ref.LUMA_FIX_*``) — because int32
multiply-shift vectorizes on the VPU with no int->float->int conversions.
The two roundings straddle the same real-valued luma, so outputs differ
from the C binary by at most +-1 u8 step, inside the agreed golden-parity
tolerance (SURVEY.md §7; pinned by tests/test_golden_parity.py, which also
documents the skew-rate bound). The OpenMP ``parallel for`` over pixels
becomes a Pallas grid of row-strips; each strip is one (C, TH, W) u8 VMEM
block processed on the VPU, with the grid pipelined by Mosaic (HBM->VMEM
DMA overlapped with compute), which is the TPU-idiomatic replacement for
thread fork/join.
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
    round_up,
)


def pick_strip(h: int, w: int = 2048, sublane: int = 32,
               prefer: int = 256) -> int:
    """Pick a row-strip height: a multiple of ``sublane`` that balances block
    size against zero-padding waste and keeps the stencil kernels' f32
    working set (roughly a dozen (th, w) temporaries for the 3-view halo
    kernels) inside the ~16 MiB VMEM budget for wide images."""
    budget_rows = (10 * 1024 * 1024) // (max(w, 128) * 4 * 8)
    cap = max(sublane, (budget_rows // sublane) * sublane)
    best = sublane
    for th in (prefer, prefer // 2, prefer // 4, sublane):
        if th > cap:
            continue
        waste = round_up(h, th) - h
        if waste <= max(sublane, int(0.08 * h)):
            best = th
            break
    return min(best, cap, round_up(h, sublane))


def _grayscale_kernel(img_ref, out_ref, *, channels: int):
    r = img_ref[0].astype(jnp.int32)
    g = img_ref[1].astype(jnp.int32)
    b = img_ref[2].astype(jnp.int32)
    lum = (xla_ref.LUMA_FIX_R * r + xla_ref.LUMA_FIX_G * g
           + xla_ref.LUMA_FIX_B * b) >> xla_ref.LUMA_FIX_SHIFT
    lum8 = lum.astype(jnp.uint8)
    out_ref[0] = lum8
    out_ref[1] = lum8
    out_ref[2] = lum8
    if channels > 3:
        out_ref[3] = img_ref[3]


def _grayscale_padded(x: jax.Array, th: int, in_place: bool = False
                      ) -> jax.Array:
    c, hp, wp = x.shape
    # in_place reproduces the reference kernel's in-place contract
    # (parallel_to_grayscale.c writes into its input buffer): the input
    # buffer is donated and aliased to the output. Safe for this kernel
    # only — each grid step reads exactly the strip it overwrites; the
    # stencil kernels read neighbor strips and must NOT alias.
    aliases = {0: 0} if in_place else {}
    return pl.pallas_call(
        functools.partial(_grayscale_kernel, channels=c),
        grid=(hp // th,),
        in_specs=[pl.BlockSpec((c, th, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, th, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.uint8),
        input_output_aliases=aliases,
        interpret=interpret_mode(),
    )(x)


@functools.partial(jax.jit, static_argnames=("strip", "passes"))
def grayscale(img: jax.Array, strip: int | None = None,
              passes: int = 1) -> jax.Array:
    """Planar (C, H, W) u8 -> (C, H, W) u8 grayscale via a Pallas kernel.

    ``passes`` repeats the kernel on-device (the reference drivers' repeat
    loop, ``monolithic/src/main.c:33-35``); padding/cropping happens once
    outside the loop so repeated passes run at pure kernel bandwidth.
    """
    c, h, w = img.shape
    th = strip or pick_strip(h, w)
    x = pad2d(img, th, LANE)
    # Aliasing is always sound here: when the input is a jit-boundary
    # argument XLA inserts the defensive copy itself; when it is a padded
    # intermediate or the loop carry, the buffer is truly reused.
    if passes == 1:
        out = _grayscale_padded(x, th, in_place=True)
    else:
        out = jax.lax.fori_loop(
            0, passes, lambda _, v: _grayscale_padded(v, th, in_place=True),
            x)
    return crop2d(out, h, w)
