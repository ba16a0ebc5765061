"""Pallas TPU 3x3 weighted convolution with normalization.

Capability twin of the reference's ``collapse(3)`` convolution kernel
(``old/parallel_convolution.c:8-24``): zero-padded same-size 3x3 weighted
stencil per channel, normalized by an integer divisor (GBLUR_NORM = 16 for
the 1-2-1 Gaussian). Integer mode reproduces the C accumulate-then-integer-
divide semantics; float mode is the TPU-native path.

Same strip/halo structure as the Sobel kernel (three shifted BlockSpec views
of the input), generalized to weighted taps over (C, TH, W) blocks.
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
    cast,
    crop2d,
    interpret_mode,
    pad2d,
)
from openmp_parallel_computing_tpu.ops.grayscale import pick_strip
from openmp_parallel_computing_tpu.ops.sobel import _shift_cols


def _conv_kernel(up_ref, cur_ref, dn_ref, out_ref, *, th: int, h: int,
                 w: int, taps, norm, integer: bool, acc_dtype, out_dtype,
                 clamp_u8: bool):
    i = pl.program_id(0)
    shape = cur_ref.shape[1:]
    grow = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * th
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    in_image = (grow < h) & (col < w)

    def planes(c):
        zero = jnp.zeros(shape, acc_dtype)
        # Zero-padded convolution: pixels outside [0,h)x[0,w) contribute 0.
        # Masking the *inputs* (not just relying on array zero-padding)
        # keeps repeated passes correct — a previous pass writes nonzero
        # values into the padding region next to the image edge.
        cur = jnp.where(in_image, cast(cur_ref[c], acc_dtype), zero)
        above = jnp.concatenate(
            [cast(up_ref[c, th - 1:th, :], acc_dtype), cur[:-1]], axis=0)
        below = jnp.concatenate(
            [cur[1:], cast(dn_ref[c, 0:1, :], acc_dtype)], axis=0)
        # Row halos come from neighbor strips: mask both the image-boundary
        # wrap-around (clamped up/down views) and their padding columns.
        above = jnp.where((grow == 0) | ~in_image, zero, above)
        below = jnp.where((grow == h - 1) | ~in_image, zero, below)
        return above, cur, below

    c_total = cur_ref.shape[0]
    for c in range(c_total):
        above, cur, below = planes(c)
        rows = (above, cur, below)
        acc = jnp.zeros_like(cur)
        for ky in range(3):
            for kx in range(3):
                tap = taps[ky][kx]
                if tap == 0:
                    continue
                shifted = _shift_cols(rows[ky], kx - 1)
                acc = acc + shifted * jnp.asarray(tap, acc_dtype)
        if integer:
            # C integer division truncates toward zero.
            q = jnp.abs(acc) // jnp.asarray(norm, acc_dtype)
            acc = jnp.sign(acc) * q
        else:
            acc = acc * jnp.asarray(1.0 / norm, acc_dtype)
        if clamp_u8:
            acc = jnp.clip(acc, 0, 255)
        out_ref[c] = cast(acc, out_dtype)


@functools.partial(jax.jit, static_argnames=("taps", "norm", "integer",
                                             "clamp_u8", "strip", "passes"))
def conv3x3(img: jax.Array, taps=xla_ref.GBLUR_KERNEL,
            norm: int | float = xla_ref.GBLUR_NORM, integer: bool = True,
            clamp_u8: bool = False, strip: int | None = None,
            passes: int = 1) -> jax.Array:
    """Planar (C, H, W) -> (C, H, W) 3x3 weighted convolution.

    ``integer=True`` -> int32 accumulate + truncating division (reference
    semantics); otherwise f32. ``clamp_u8=True`` additionally clamps to
    [0, 255] and returns uint8 (the usable blur-image op, which is also the
    mode that supports efficient on-device ``passes`` repetition).
    """
    c, h, w = img.shape
    th = strip or pick_strip(h, w)
    x = pad2d(img, th, LANE)
    acc_dtype = jnp.int32 if integer else jnp.float32
    out_dtype = jnp.uint8 if clamp_u8 else acc_dtype

    def one(v):
        _, hp, wp = v.shape
        n = hp // th
        spec = lambda fn: pl.BlockSpec((c, th, wp), fn,
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_conv_kernel, th=th, h=h, w=w, taps=taps,
                              norm=norm, integer=integer, acc_dtype=acc_dtype,
                              out_dtype=out_dtype, clamp_u8=clamp_u8),
            grid=(n,),
            in_specs=[
                spec(lambda i: (0, jnp.maximum(i - 1, 0), 0)),
                spec(lambda i: (0, i, 0)),
                spec(lambda i: (0, jnp.minimum(i + 1, n - 1), 0)),
            ],
            out_specs=spec(lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((c, hp, wp), out_dtype),
            interpret=interpret_mode(),
        )(v, v, v)

    if passes == 1:
        out = one(x)
    else:
        # Multi-pass repetition always runs as an on-device fori_loop (the
        # reference's documented exemplar uses passes=1000 — unrolling
        # would build a 1000-launch graph). When in/out dtypes differ
        # (e.g. u8 input with an int32/f32 accumulator output), pre-cast
        # the input once so every pass is out_dtype -> out_dtype; pass 1
        # sees identical values either way.
        if out_dtype != x.dtype:
            x = x.astype(out_dtype)
        out = jax.lax.fori_loop(0, passes, lambda _, v: one(v), x)
    return crop2d(out, h, w)


def gaussian_blur(img: jax.Array, passes: int = 1) -> jax.Array:
    """1-2-1 Gaussian blur of a planar u8 image, reference GBLUR semantics."""
    return conv3x3(img, xla_ref.GBLUR_KERNEL, xla_ref.GBLUR_NORM,
                   integer=True, clamp_u8=True, passes=passes)
