"""VMEM-resident Pallas pyramid sampler (value + analytic gradient).

The XLA separable sampler (``costs.edge_cost_pyramid_xy``) is gather-free
by materializing dense hat-weight tensors and contracting them against the
pyramid levels. XLA cannot fuse the elementwise weight *builders* into the
``dot`` operands, so the weights round-trip HBM — measured at ~4.5 GB per
value+grad pass at a 16k batch (f32[21,8,16384,120] and friends: the exact
large-batch edge glue named in docs/DESIGN.md §2g), and the reason the
H=50 pod config goes HBM-bound at 4096 scenarios (BASELINE.md, round 3).

This kernel keeps the weights in VMEM registers for the lifetime of one
(TILE, level-width) block: coordinates stream in as (TILE, 1) columns, the
hat-weight pair and its derivative are built on the fly with a lane iota,
and the bilinear contraction runs as two MXU matmuls per level against the
VMEM-resident level (level 0 of a 1080p frame is 68x120 f32 = 32 KB; both
levels total <34 KB):

    t2 = wx @ L^T        (TILE, hf)    e  = sum(wy  * t2, lanes)
    t1 = wy @ L          (TILE, wf)    gx = sum(t1 * dwx, lanes)
                                       gy = sum(dwy * t2, lanes)

HBM traffic per point drops from ~188 weight floats (x2: write + read)
to 2 coordinate floats in + 1-3 result floats out. The value-only mode
skips t1 (one matmul per level).

Numerics match ``costs.edge_cost_pyramid_xy`` exactly in exact arithmetic:
the same one-hot-pair weights (``costs._hat_weights``: floor carries zero
gradient, so the summed interpolant's gradient is the true one-sided
derivative at every kink — the round-3 autodiff-at-kinks fix), and the
same border-clip convention (gradient passes ON the border, blocked
strictly outside, ``costs._clip_coord``). On-chip the MXU contraction
reassociates sums, so equivalence tests use the solver suite's usual f32
tolerances. Used by the sweep backend when
``MPCConfig.edge_sampler="pallas"``; equivalence with the XLA sampler is
tested per schedule (tests/test_mpc.py) and on the real chip (tests_tpu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmp_parallel_computing_tpu.ops._tiling import interpret_mode

# Default points per grid step (overridable per call: ``tile=``). The
# on-chip tile sweep (results/tpu_v5e/sampler_kernel_study_r4.json) sets
# the default; the per-tile VMEM working set is ~4 KB/point-row
# (weights + derivative weights + matmul results, lane-padded), so even
# 4096-point tiles stay well under VMEM.
TILE = 512


def _sample_kernel(x_ref, y_ref, *refs, shapes, scales, h_img, w_img,
                   grads: bool):
    """One (TILE, 1) block of points against all VMEM-resident levels.

    ``refs``: per level (L, L^T) input refs, then the outputs
    (v[, gx, gy]). Static: ``shapes`` (hf, wf) per level, ``scales``,
    the image dims, and whether gradients are produced.
    """
    nlev = len(shapes)
    level_refs = refs[:2 * nlev]
    out_refs = refs[2 * nlev:]

    xn = x_ref[:]                                   # (T, 1) normalized
    yn = y_ref[:]
    xp = (xn + 1.0) * (0.5 * (w_img - 1))           # pixel coords
    yp = (yn + 1.0) * (0.5 * (h_img - 1))

    v = jnp.zeros_like(xn)
    gx = jnp.zeros_like(xn) if grads else None
    gy = jnp.zeros_like(xn) if grads else None

    for lv, ((hf, wf), s) in enumerate(zip(shapes, scales)):
        L = level_refs[2 * lv]
        LT = level_refs[2 * lv + 1]
        # Cell k of an s-pooled level is centered at pixel s*k + (s-1)/2
        # (the half-cell shift of costs.edge_cost_pyramid).
        off = (s - 1) / 2.0
        xl_raw = (xp - off) * (1.0 / s)
        yl_raw = (yp - off) * (1.0 / s)
        # _clip_coord: value clamps to the border; the gradient mask
        # passes ON the border, blocks strictly outside.
        xl = jnp.clip(xl_raw, 0.0, float(wf - 1))
        yl = jnp.clip(yl_raw, 0.0, float(hf - 1))
        # One-hot-pair hat weights (costs._hat_weights): floor carries no
        # gradient, d(weights)/dxl = -(j==x0) + (j==x0+1) exactly. The
        # grid iota must be INTEGER (Mosaic rejects tpu.iota of floats);
        # cell indices compare as int32, the fractional weight stays f32.
        x0 = jnp.clip(jnp.floor(xl).astype(jnp.int32), 0, wf - 2)  # (T, 1)
        y0 = jnp.clip(jnp.floor(yl).astype(jnp.int32), 0, hf - 2)
        fx = xl - x0.astype(jnp.float32)
        fy = yl - y0.astype(jnp.float32)
        # One wide compare pair per axis, reused by the weight AND its
        # derivative: with a = onehot(x0), b = onehot(x0+1),
        #   wx  = a + fx * (b - a)        dwx = b - a
        # (halves the VPU weight-build work vs building wx and dwx from
        # four independent masked selects). A degenerate single-cell axis
        # gets constant weight / zero derivative (_hat_weights'
        # convention; the pair construction is meaningless at size 1).
        if wf == 1:
            wx = jnp.ones((xn.shape[0], 1), jnp.float32)
            dwx = jnp.zeros_like(wx)
        else:
            jx = jax.lax.broadcasted_iota(jnp.int32, (xn.shape[0], wf), 1)
            ax = jnp.where(jx == x0, 1.0, 0.0)
            bx = jnp.where(jx == x0 + 1, 1.0, 0.0)
            dwx = bx - ax                                    # (T, wf)
            wx = ax + fx * dwx
        if hf == 1:
            wy = jnp.ones((xn.shape[0], 1), jnp.float32)
            dwy = jnp.zeros_like(wy)
        else:
            jy = jax.lax.broadcasted_iota(jnp.int32, (xn.shape[0], hf), 1)
            ay = jnp.where(jy == y0, 1.0, 0.0)
            by = jnp.where(jy == y0 + 1, 1.0, 0.0)
            dwy = by - ay                                    # (T, hf)
            wy = ay + fy * dwy

        # t2[p, i] = sum_j L[i, j] wx[p, j] — the column interpolation of
        # every level row; e = wy . t2 finishes the bilinear sample.
        t2 = jnp.dot(wx, LT[:], preferred_element_type=jnp.float32)
        e = jnp.sum(wy * t2, axis=1, keepdims=True)         # (T, 1)
        v = v + (1.0 - e * (1.0 / 255.0))

        if grads:
            mx = ((xl_raw >= 0.0) & (xl_raw <= float(wf - 1))
                  ).astype(jnp.float32)
            my = ((yl_raw >= 0.0) & (yl_raw <= float(hf - 1))
                  ).astype(jnp.float32)
            t1 = jnp.dot(wy, L[:], preferred_element_type=jnp.float32)
            # d(1 - e/255)/d x_normalized, all chain factors static:
            # de/dxl * (1/s px->level) * (0.5*(w-1) norm->px) * (-1/255).
            cx = -(1.0 / 255.0) * (1.0 / s) * 0.5 * (w_img - 1)
            cy = -(1.0 / 255.0) * (1.0 / s) * 0.5 * (h_img - 1)
            gx = gx + cx * mx * jnp.sum(t1 * dwx, axis=1, keepdims=True)
            gy = gy + cy * my * jnp.sum(dwy * t2, axis=1, keepdims=True)

    out_refs[0][:] = v
    if grads:
        out_refs[1][:] = gx
        out_refs[2][:] = gy


def _run(levels, x, y, h_img, w_img, scales, grads: bool,
         tile: int = TILE):
    """Flatten lanes-layout coords, tile over points, run the kernel.

    x, y: (K, m, *B) — any trailing batch dims. Returns per-point arrays
    of the same shape: v (and gx, gy when ``grads``).
    """
    shape = x.shape
    n_pts = 1
    for d in shape:
        n_pts *= int(d)
    n_pad = -(-n_pts // tile) * tile
    xf = jnp.pad(x.reshape(n_pts), (0, n_pad - n_pts)).reshape(n_pad, 1)
    yf = jnp.pad(y.reshape(n_pts), (0, n_pad - n_pts)).reshape(n_pad, 1)

    shapes = tuple((int(l.shape[0]), int(l.shape[1])) for l in levels)
    level_args = []
    level_specs = []
    for l in levels:
        lf = l.astype(jnp.float32)
        level_args += [lf, lf.T]
        for a in (lf, lf.T):
            level_specs.append(pl.BlockSpec(
                a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    col = lambda: pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    n_out = 3 if grads else 1
    outs = pl.pallas_call(
        functools.partial(_sample_kernel, shapes=shapes,
                          scales=tuple(scales), h_img=h_img, w_img=w_img,
                          grads=grads),
        grid=(n_pad // tile,),
        in_specs=[col(), col()] + level_specs,
        out_specs=tuple(col() for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)
                        for _ in range(n_out)),
        interpret=interpret_mode(),
    )(xf, yf, *level_args)
    if not grads:
        outs = (outs,) if not isinstance(outs, (tuple, list)) else outs
    return tuple(o.reshape(n_pad)[:n_pts].reshape(shape) for o in outs)


def edge_vals_lanes(pyramid, x, y, h_img, w_img, scales,
                    tile: int = TILE) -> jax.Array:
    """Per-state pyramid edge cost on lanes-layout coordinates:
    x, y (K, m, *B) -> (K, *B), identical contract to
    ``costs.edge_cost_pyramid_xy`` (mean over levels and features)."""
    (v,) = _run(pyramid, x, y, h_img, w_img, scales, grads=False,
                tile=tile)
    return jnp.mean(v, axis=1) / len(pyramid)


def edge_vg_lanes(pyramid, x, y, h_img, w_img, scales, tile: int = TILE):
    """Values AND the gradient of their sum, in one kernel pass.

    Returns ``(vals (K, *B), gx (K, m, *B), gy (K, m, *B))`` where
    (gx, gy) = d(sum(vals)) / d(x, y) — the quantity
    ``_SweepLanes.edge_grads`` needs, computed analytically in-kernel
    instead of autodiffing the XLA sampler."""
    v, gx, gy = _run(pyramid, x, y, h_img, w_img, scales, grads=True,
                     tile=tile)
    scale = 1.0 / (x.shape[1] * len(pyramid))
    return (jnp.mean(v, axis=1) / len(pyramid),
            gx * scale, gy * scale)
