"""Fused Pallas Riccati backward sweep (batch-in-lanes).

The XLA backward scan issues ~12 small batched ops per horizon step; on TPU
each tiny op pays fixed launch/HBM-roundtrip overhead, which dominates the
batched MPC solve. This kernel runs the whole recursion VMEM-resident:

- layout: every per-step matrix is stored batch-LAST — (H, n, n, B) — so a
  scenario tile occupies the 128-wide lane dimension and every matrix
  element is a (B_tile,) vector. All linear algebra (tiny matmuls, the
  unrolled Cholesky) becomes lane-vectorized VPU arithmetic with zero
  HBM traffic between horizon steps.
- grid: (batch_tiles, H). The time dimension streams per-step blocks from
  HBM in reverse via the index maps (Mosaic double-buffers them); the value
  function carry (Vx, Vxx) lives in VMEM scratch, re-initialized from the
  terminal expansion at each tile's first step.

Numerics are identical to ``riccati.backward`` (same operations, same
unrolled Cholesky); equivalence is tested on the virtual mesh and the
kernel is exercised on real TPU by the benchmarks.

Technique reference: block-parallel / recursion-structured Riccati solvers
(e.g. "The Parallelization of Riccati Recursion", arXiv:1809.06360) — here
the parallel axis is the scenario batch rather than the horizon, which
matches the engine's throughput-bound regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmp_parallel_computing_tpu.ops._tiling import interpret_mode

LANE = 128


def _mm(a, b, ka: int):
    """Batch-last matmul: a (p, ka, *B) @ b (ka, q, *B) -> (p, q, *B) via an
    unrolled sum of broadcasted FMAs (pure VPU; no transposes). ``*B`` is
    one or more trailing batch dims (lanes, or sublanes x lanes when the
    batch is packed into full vector tiles)."""
    out = a[:, 0:1, ...] * b[0:1, :, ...]
    for j in range(1, ka):
        out = out + a[:, j:j + 1, ...] * b[j:j + 1, :, ...]
    return out


def _mv(a, v, ka: int):
    """a (p, ka, *B) @ v (ka, *B) -> (p, *B)."""
    out = a[:, 0, ...] * v[0:1, ...]
    for j in range(1, ka):
        out = out + a[:, j, ...] * v[j:j + 1, ...]
    return out


def _mtm(a, b, ka: int):
    """a^T @ b WITHOUT materializing a^T: a (ka, p, *B), b (ka, q, *B) ->
    (p, q, *B) as a sum of ka broadcasted outer products. Row-rebuild
    transposes (`jnp.concatenate` of row slices) are multi-tile relayout
    copies on TPU; summing outer products reads both operands in their
    native layout.

    NB the two-step subscripts (``a[k][:, None, ...]``, never
    ``a[k, :, None, ...]``): mixing an integer index with ``None`` in ONE
    subscript routes through jnp's advanced-indexing path and emits a
    ``gather`` — unsupported >2D in Mosaic (interpret mode hides it).
    Split subscripts lower to slice+squeeze+broadcast."""
    out = a[0][:, None, ...] * b[0][None, :, ...]
    for k in range(1, ka):
        out = out + a[k][:, None, ...] * b[k][None, :, ...]
    return out


def _mtv(a, v, ka: int):
    """a^T @ v without materializing a^T: a (ka, p, *B), v (ka, *B) ->
    (p, *B)."""
    out = a[0] * v[0:1, ...]
    for k in range(1, ka):
        out = out + a[k] * v[k:k + 1, ...]
    return out




def _spd_solve_lanes(A, B, n: int):
    """Solve A X = B with A (n, n, *Bt) SPD, B (n, k, *Bt): unrolled
    column-oriented Cholesky over batch vectors.

    The factorization is column-at-a-time: each column update is ONE
    (n, *Bt) FMA instead of the n scalar-row (1, *Bt) ops of the classic
    element form, so the VPU issue count drops ~2x and every op covers n
    sublanes instead of one. ``cols[j]`` holds d_j at row j and L[i][j]
    below it; rows above j carry garbage that never crosses into valid
    rows (all ops are row-aligned). Divisions in the triangular solves
    are replaced by multiplies with the cached 1/d_j.
    """
    cols = []                       # cols[j]: (n, *Bt)
    inv_d = []                      # (1, *Bt) reciprocals of the pivots
    for j in range(n):
        s = A[:, j, ...]
        for p in range(j):
            s = s - cols[p] * cols[p][j:j + 1, ...]
        r = 1.0 / jnp.sqrt(s[j:j + 1, ...])
        cols.append(s * r)          # row j: pivot/sqrt(pivot) = d_j
        inv_d.append(r)
    Y = [None] * n
    for i in range(n):
        s = B[i, :, ...]
        for p in range(i):
            s = s - cols[p][i:i + 1, ...] * Y[p]
        Y[i] = s * inv_d[i]
    X = [None] * n
    for i in reversed(range(n)):
        s = Y[i]
        for p in range(i + 1, n):
            s = s - cols[i][p:p + 1, ...] * X[p]
        X[i] = s * inv_d[i]
    return jnp.concatenate([x[None] for x in X], axis=0)  # (n, k, *Bt)


def _backward_kernel(fx_ref, fu_ref, lx_ref, lu_ref, lxx_ref, luu_ref,
                     lux_ref, vx_ref, vxx_ref, K_ref, k_ref,
                     Vx_scr, Vxx_scr, *, n: int, c: int, reg: float):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():  # terminal condition for this batch tile
        Vx_scr[...] = vx_ref[...]
        Vxx_scr[...] = vxx_ref[...]

    fx = fx_ref[0]          # (n, n, Bt)
    fu = fu_ref[0]          # (n, c, Bt)
    Vx = Vx_scr[...]        # (n, Bt)
    Vxx = Vxx_scr[...]      # (n, n, Bt)

    # Transposed products as outer-product sums — f^T is never
    # materialized (row-rebuild transposes are multi-tile relayouts).
    Vxx_fx = _mm(Vxx, fx, n)              # (n, n, Bt)
    Vxx_fu = _mm(Vxx, fu, n)              # (n, c, Bt)

    Qx = lx_ref[0] + _mtv(fx, Vx, n)      # (n, Bt)
    Qu = lu_ref[0] + _mtv(fu, Vx, n)      # (c, Bt)
    Qxx = lxx_ref[0] + _mtm(fx, Vxx_fx, n)
    Quu = luu_ref[0] + _mtm(fu, Vxx_fu, n)
    Qux = lux_ref[0] + _mtm(fu, Vxx_fx, n)

    eye = jax.lax.broadcasted_iota(jnp.int32, (c, c, 1), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (c, c, 1), 1)
    Quu_reg = Quu + jnp.where(eye, jnp.float32(reg), 0.0)

    rhs = jnp.concatenate([Qu[:, None, :], Qux], axis=1)  # (c, 1+n, Bt)
    sol = -_spd_solve_lanes(Quu_reg, rhs, c)              # (c, 1+n, Bt)
    kff = sol[:, 0, :]                                    # (c, Bt)
    K = sol[:, 1:, :]                                     # (c, n, Bt)

    # Simplified value update (exact identity given K/kff solve against
    # Quu_reg; same form in every backend — see riccati.backward). No
    # explicit symmetrization: Qux^T K is symmetric up to fp-ulp noise
    # and the Cholesky consumes the matrix as if symmetric (see
    # sweep_pallas._backward_step).
    Vx_new = Qx + _mtv(Qux, kff, c)
    Vxx_new = Qxx + _mtm(Qux, K, c)

    Vx_scr[...] = Vx_new
    Vxx_scr[...] = Vxx_new
    K_ref[0] = K
    k_ref[0] = kff


@functools.partial(jax.jit, static_argnames=("reg",))
def backward_batched(fx, fu, lx, lu, lxx, luu, lux, vx, vxx,
                     reg: float = 1e-6):
    """Batched Riccati backward sweep as one fused Pallas kernel.

    Batch-first inputs (as produced by a vmapped expansion):
      fx (B,H,n,n), fu (B,H,n,c), lx (B,H,n), lu (B,H,c), lxx (B,H,n,n),
      luu (B,H,c,c), lux (B,H,c,n), vx (B,n), vxx (B,n,n)
    Returns (K (B,H,c,n), k (B,H,c)).

    The batch is padded to a lane multiple and transposed to batch-last
    once; inside the kernel the entire recursion is VMEM-resident.
    """
    Bb, H, n, _ = fx.shape
    c = fu.shape[-1]
    Bp = -(-Bb // LANE) * LANE

    def to_lanes(a, ndim):
        # (B, H, ...) -> (H, ..., B) zero-padded to Bp
        perm = tuple(range(1, ndim)) + (0,)
        a = jnp.transpose(a, perm)
        pad = [(0, 0)] * (ndim - 1) + [(0, Bp - Bb)]
        return jnp.pad(a, pad)

    fx_l = to_lanes(fx, 4)
    fu_l = to_lanes(fu, 4)
    lx_l = to_lanes(lx, 3)
    lu_l = to_lanes(lu, 3)
    lxx_l = to_lanes(lxx, 4)
    luu_l = to_lanes(luu, 4)
    lux_l = to_lanes(lux, 4)
    vx_l = to_lanes(vx, 2)
    vxx_l = to_lanes(vxx, 3)
    # Padding lanes would hit a singular Quu (all zeros); give them
    # identity luu so the Cholesky stays finite.
    eye_c = jnp.eye(c, dtype=luu_l.dtype)[None, :, :, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Bp), 3)
    luu_l = jnp.where(lane >= Bb, eye_c, luu_l)

    nb = Bp // LANE
    grid = (nb, H)
    t_rev = lambda b, t: (H - 1 - t, 0, 0, b)
    t_rev3 = lambda b, t: (H - 1 - t, 0, b)
    term = lambda b, t: (0, 0, b)
    term2 = lambda b, t: (0, b)

    spec4 = lambda s1, s2, fn: pl.BlockSpec((1, s1, s2, LANE), fn,
                                            memory_space=pltpu.VMEM)
    spec3 = lambda s1, fn: pl.BlockSpec((1, s1, LANE), fn,
                                        memory_space=pltpu.VMEM)

    K_l, k_l = pl.pallas_call(
        functools.partial(_backward_kernel, n=n, c=c, reg=reg),
        grid=grid,
        in_specs=[
            spec4(n, n, t_rev),                       # fx
            spec4(n, c, t_rev),                       # fu
            spec3(n, t_rev3),                         # lx
            spec3(c, t_rev3),                         # lu
            spec4(n, n, t_rev),                       # lxx
            spec4(c, c, t_rev),                       # luu
            spec4(c, n, t_rev),                       # lux
            pl.BlockSpec((n, LANE), term2, memory_space=pltpu.VMEM),   # vx
            pl.BlockSpec((n, n, LANE), term, memory_space=pltpu.VMEM),  # vxx
        ],
        out_specs=(
            spec4(c, n, t_rev),                       # K
            spec3(c, t_rev3),                         # k
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, c, n, Bp), jnp.float32),
            jax.ShapeDtypeStruct((H, c, Bp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, LANE), jnp.float32),       # Vx carry
            pltpu.VMEM((n, n, LANE), jnp.float32),    # Vxx carry
        ],
        interpret=interpret_mode(),
    )(fx_l, fu_l, lx_l, lu_l, lxx_l, luu_l, lux_l, vx_l, vxx_l)

    K = jnp.transpose(K_l[..., :Bb], (3, 0, 1, 2))
    kk = jnp.transpose(k_l[..., :Bb], (2, 0, 1))
    return K, kk
