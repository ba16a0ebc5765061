"""Whole-sweep fused kernels: linearize + expand + Riccati backward in one
Pallas launch, and the line-searched forward rollout in another.

Extends the batch-in-lanes design of ``riccati_pallas`` (docs/DESIGN.md §2)
to the entire iLQR sweep. Per sweep the solver now costs two kernel
launches plus the XLA edge-pyramid sampling — the closed-form IBVS
linearization, the analytic quadratic expansion, the Cholesky gains, the
dynamics rollout, and the line-search cost accumulation all happen inside
the kernels on lane vectors, with nothing but the per-step coefficient
streams touching HBM.

Layout: scenario batch B in the last (lane) dimension everywhere —
ps (H+1, n, B), us/z/y (H, c, B), gains K (H, c, n, B). The solver keeps
this layout across the whole ADMM loop and transposes only at the
boundaries (scenario ingest, edge sampling, results).

State axis: SPLIT order [x_0..x_{m-1}, y_0..y_{m-1}] rather than the
public interleaved [x_0, y_0, ...] (the solver permutes at the lanes
boundary). Split order makes the coordinate planes contiguous slices and
turns the IBVS Jacobian into four diagonal m x m blocks, so applying fx
or fx^T anywhere in the recursion is a handful of (.., m, B)-wide FMAs
instead of an n-term dense matmul (``_fx_coeffs``/``_fx_right``/
``_fxT_left``).

Line search: candidates alpha = (0, 1, 0.5, 0.25). alpha=0 reproduces the
nominal trajectory exactly (u = u_nom + K(p - p_nom) stays u_nom when p
tracks p_nom), so the "did anything improve" comparison is just the argmin
over candidates — no separate nominal cost evaluation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmp_parallel_computing_tpu.models.mpc.dynamics import STATE_LIMIT
from openmp_parallel_computing_tpu.models.mpc.riccati_pallas import (
    _mm,
    _mtm,
    _mtv,
    _mv,
    _spd_solve_lanes,
)
from openmp_parallel_computing_tpu.ops._tiling import interpret_mode

LANE = 128
ALPHAS = (0.0, 1.0, 0.5, 0.25)
CONTROL_DIM = 6


def _features(p, m: int):
    """Split a (n, *B) SPLIT-layout state block into x (m, *B), y (m, *B).

    The sweep kernels keep the state axis in split order
    ``[x_0..x_{m-1}, y_0..y_{m-1}]`` (the solver permutes from the
    interleaved public layout at the lanes boundary), so the coordinate
    planes are plain contiguous slices — no row rebuilds — and the IBVS
    Jacobian becomes four diagonal blocks (see ``_fx_coeffs``). ``*B`` is
    one or more trailing batch dims (lanes, or sublanes x lanes when
    packed)."""
    return p[:m, ...], p[m:, ...]


def _fx_coeffs(p, u, inv_depth, dt: float, m: int):
    """Diagonal-block coefficients of the IBVS state Jacobian.

    In split layout fx = [[diag(A), diag(Bc)], [diag(C), diag(D)]] — the
    per-feature 2x2 blocks of ``dynamics.linearize_analytic`` become four
    diagonal m x m blocks, so applying fx (or its transpose) to anything
    is four wide FMAs instead of an n-term dense matmul. Returns
    (A, Bc, C, D), each (m, *B)."""
    x, y = _features(p, m)
    vz, wx, wy, wz = u[2:3], u[3:4], u[4:5], u[5:6]  # (1, *B)
    iz = inv_depth
    A = 1.0 + dt * (vz * iz + y * wx - 2.0 * x * wy)
    Bc = dt * (x * wx + wz)
    C = dt * (-y * wy - wz)
    D = 1.0 + dt * (vz * iz + 2.0 * y * wx - x * wy)
    return A, Bc, C, D


def _fx_right(M, A, Bc, C, D, m: int):
    """M @ fx for M (p, n, *B) with fx in diagonal-block form: the two
    output column blocks are 2 wide FMAs each (out[:, :m] =
    M[:, :m] A + M[:, m:] C, mirrored for the right half) instead of n
    dense FMA columns."""
    Ml, Mr = M[:, :m, ...], M[:, m:, ...]
    left = Ml * A[None] + Mr * C[None]
    right = Ml * Bc[None] + Mr * D[None]
    return jnp.concatenate([left, right], axis=1)


def _fxT_left(M, A, Bc, C, D, m: int):
    """fx^T @ M for M (n, q, *B): row blocks scale by the transposed
    diagonal blocks (fx^T = [[diag(A), diag(C)], [diag(Bc), diag(D)]])."""
    Mt, Mb = M[:m, ...], M[m:, ...]
    top = A[:, None, ...] * Mt + C[:, None, ...] * Mb
    bot = Bc[:, None, ...] * Mt + D[:, None, ...] * Mb
    return jnp.concatenate([top, bot], axis=0)


def _fxT_vec(v, A, Bc, C, D, m: int):
    """fx^T @ v for v (n, *B)."""
    vt, vb = v[:m, ...], v[m:, ...]
    return jnp.concatenate([A * vt + C * vb, Bc * vt + D * vb], axis=0)


def _build_fu(p, inv_depth, dt: float, m: int):
    """Control Jacobian in split row order: fu (n, c, *B), x-plane rows
    first. Columns mirror ``dynamics.linearize_analytic``; built as two
    (m, c, *B) blocks vectorized over the feature dimension."""
    x, y = _features(p, m)
    iz = inv_depth
    one = jnp.ones_like(x)
    zv = jnp.zeros_like(x)
    col = lambda v: v[:, None, ...]             # (m,*B) -> (m,1,*B)
    fu_x = jnp.concatenate([
        col(-iz), col(zv), col(x * iz),
        col(x * y), col(-(one + x * x)), col(y)], axis=1)
    fu_y = jnp.concatenate([
        col(zv), col(-iz), col(y * iz),
        col(one + y * y), col(-(x * y)), col(-x)], axis=1)
    return dt * jnp.concatenate([fu_x, fu_y], axis=0)


def _dyn_step(p, u, inv_depth, dt: float, m: int):
    """p' = p + dt * L(p) u on lane vectors, split layout. p (n,B)."""
    x, y = _features(p, m)
    vx, vy, vz = u[0:1], u[1:2], u[2:3]
    wx, wy, wz = u[3:4], u[4:5], u[5:6]
    iz = inv_depth
    xdot = (-vx * iz + x * vz * iz + x * y * wx - (1.0 + x * x) * wy
            + y * wz)
    ydot = (-vy * iz + y * vz * iz + (1.0 + y * y) * wx - x * y * wy
            - x * wz)
    # State trust region keeps diverging candidates finite — a static
    # Python float, usable inside the kernel; must match dynamics.step.
    lim = STATE_LIMIT
    nxt_x = jnp.clip(x + dt * xdot, -lim, lim)
    nxt_y = jnp.clip(y + dt * ydot, -lim, lim)
    return jnp.concatenate([nxt_x, nxt_y], axis=0)


def _backward_step(p_t, u_t, z_t, y_t, g_t, izd, target, Vx, Vxx, *,
                   m: int, q: float, r: float, rho: float, qe: float,
                   dt: float, reg: float, eye_fn):
    """One Riccati backward step on lane vectors: linearize, expand, solve.

    Shared by the split backward kernel and the unified kernel — the single
    source of truth for the recursion (backend equivalence depends on it).
    Returns (K, kff, Vx_new, Vxx_new).
    """
    n, c = 2 * m, CONTROL_DIM
    Af, Bf, Cf, Df = _fx_coeffs(p_t, u_t, izd, dt, m)
    fu = _build_fu(p_t, izd, dt, m)
    lx = 2.0 * q * (p_t - target) + qe * g_t
    lu = 2.0 * r * u_t + rho * (u_t - z_t + y_t)
    # fx is applied structurally (4 diagonal blocks -> wide FMAs), fu^T /
    # Qux^T products are outer-product sums (no materialized transposes),
    # and the value update uses the simplified exact identities
    # (Vx' = Qx + Qux'k, Vxx' = Qxx + Qux'K) — see riccati.backward;
    # together they replace five n-term dense matmuls per step with two
    # and eliminate every relayout-copy transpose from the recursion.
    Qx = lx + _fxT_vec(Vx, Af, Bf, Cf, Df, m)
    Qu = lu + _mtv(fu, Vx, n)
    Qxx = 2.0 * q * eye_fn(n) + _fxT_left(
        _fx_right(Vxx, Af, Bf, Cf, Df, m), Af, Bf, Cf, Df, m)
    U = _mtm(fu, Vxx, n)                      # fu^T Vxx (c, n, *B)
    Quu = (2.0 * r + rho + reg) * eye_fn(c) + _mm(U, fu, n)
    Qux = _fx_right(U, Af, Bf, Cf, Df, m)     # (fu^T Vxx) fx
    rhs = jnp.concatenate([Qu[:, None, ...], Qux], axis=1)
    sol = -_spd_solve_lanes(Quu, rhs, c)
    kff = sol[:, 0, ...]
    K = sol[:, 1:, ...]
    Vx_new = Qx + _mtv(Qux, kff, c)
    # No explicit symmetrization: Qux^T K = -Qux^T Quu_reg^{-1} Qux is
    # symmetric up to fp-ulp noise (as is Qxx's fx sandwich), and the
    # Cholesky consumes the matrix as if symmetric — measured identical
    # solver quality, and the 0.5(M + M^T) pass was the single biggest
    # mul block in the kernel (6 extra (n, n, B) FMAs per step).
    Vxx_new = Qxx + _mtm(Qux, K, c)
    return K, kff, Vx_new, Vxx_new


def _forward_step(t, K, kff, p_nom, u_nom, z_t, y_t, g_t, izd, target,
                  pterm, gterm, psout_ref, usout_ref, J_ref, p_scr, J_scr,
                  *, m: int, q: float, r: float, rho: float, qe: float,
                  dt: float, last_t):
    """One line-searched rollout step over the alpha candidates.

    Shared by the split forward kernel and the unified kernel. Reads and
    advances the candidate states/costs in scratch, writes the candidate
    outputs, and finalizes J (with the terminal terms) at ``last_t``.
    """
    n = 2 * m
    A = len(ALPHAS)
    for a_idx, alpha in enumerate(ALPHAS):
        p_a = p_scr[a_idx]
        u_a = u_nom + alpha * kff + _mv(K, p_a - p_nom, n)
        # stage cost at (p_a, u_a): quad + ADMM + linearized edge term
        J_add = (q * jnp.sum((p_a - target) ** 2, axis=0)
                 + r * jnp.sum(u_a ** 2, axis=0)
                 + 0.5 * rho * jnp.sum((u_a - z_t + y_t) ** 2, axis=0)
                 + qe * jnp.sum(g_t * (p_a - p_nom), axis=0))
        nxt = _dyn_step(p_a, u_a, izd, dt, m)
        J_scr[a_idx] = J_scr[a_idx] + J_add
        p_scr[a_idx] = nxt
        usout_ref[0, a_idx] = u_a
        psout_ref[0, a_idx] = nxt
    # The J output block is revisited every step; keep it defined by
    # writing the running totals, finalized with the terminal terms at the
    # last step.
    for a_idx in range(A):
        p_h = p_scr[a_idx]
        J_term = (q * jnp.sum((p_h - target) ** 2, axis=0)
                  + qe * jnp.sum(gterm * (p_h - pterm), axis=0))
        J_ref[a_idx] = jnp.where(t == last_t,
                                 J_scr[a_idx] + J_term, J_scr[a_idx])


def _backward_sweep_kernel(ps_ref, us_ref, z_ref, y_ref, g_ref, pterm_ref,
                           gterm_ref, target_ref, izd_ref, K_ref, k_ref,
                           Vx_scr, Vxx_scr, *, m: int, q: float, r: float,
                           rho: float, qe: float, dt: float, reg: float):
    n = 2 * m
    t = pl.program_id(1)
    target = target_ref[...]
    bdims = len(target_ref.shape) - 1  # number of trailing batch dims

    def _eye(k):
        shape = (k, k) + (1,) * bdims
        return (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                == jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                ).astype(jnp.float32)

    @pl.when(t == 0)
    def _():  # terminal expansion
        Vx_scr[...] = 2.0 * q * (pterm_ref[0] - target) \
            + qe * gterm_ref[0]
        Vxx_scr[...] = jnp.broadcast_to(2.0 * q * _eye(n), Vxx_scr.shape)

    K, kff, Vx_new, Vxx_new = _backward_step(
        ps_ref[0], us_ref[0], z_ref[0], y_ref[0], g_ref[0], izd_ref[...],
        target, Vx_scr[...], Vxx_scr[...], m=m, q=q, r=r, rho=rho, qe=qe,
        dt=dt, reg=reg, eye_fn=_eye)
    Vx_scr[...] = Vx_new
    Vxx_scr[...] = Vxx_new
    K_ref[0] = K
    k_ref[0] = kff


def _forward_sweep_kernel(p0_ref, ps_ref, us_ref, K_ref, k_ref, z_ref,
                          y_ref, g_ref, pterm_ref, gterm_ref, target_ref,
                          izd_ref, psout_ref, usout_ref, J_ref,
                          p_scr, J_scr, *, m: int, q: float, r: float,
                          rho: float, qe: float, dt: float, horizon: int):
    n = 2 * m
    A = len(ALPHAS)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        p_scr[...] = jnp.broadcast_to(p0_ref[...][None],
                                      (A,) + tuple(p0_ref.shape))
        J_scr[...] = jnp.zeros_like(J_scr)

    _forward_step(t, K_ref[0], k_ref[0], ps_ref[0], us_ref[0], z_ref[0],
                  y_ref[0], g_ref[0], izd_ref[...], target_ref[...],
                  pterm_ref[0], gterm_ref[0], psout_ref, usout_ref, J_ref,
                  p_scr, J_scr, m=m, q=q, r=r, rho=rho, qe=qe, dt=dt,
                  last_t=horizon - 1)


# Sublane packing: with pack >= 2 the batch occupies BOTH the sublane and
# lane dimensions — tiles of pack x LANE scenarios whose elementwise ops
# use `pack` sublanes of each (8, 128) vector tile, instead of the single
# busy sublane the row-sliced lane-vector ops otherwise get (pack=8 makes
# every op a full tile). Pure layout change (trailing reshape of the lanes
# arrays); the kernels are batch-dim agnostic. ``pack=True`` is accepted
# as 8 for backward compatibility.
SUB = 8


def _bshape(pack) -> tuple[int, ...]:
    s = SUB if pack is True else int(pack)
    return (s, LANE) if s > 1 else (LANE,)


@functools.partial(jax.jit, static_argnames=("m", "q", "r", "rho", "qe",
                                             "dt", "reg", "pack"))
def backward_sweep(ps, us, z, y, g, target, inv_depth, *, m: int, q: float,
                   r: float, rho: float, qe: float, dt: float,
                   reg: float = 1e-6, pack: bool = False):
    """Lanes-layout fused backward sweep.

    ps (H+1, n, *B), us/z/y (H, c, *B), g (H+1, n, *B), target (n, *B),
    inv_depth (m, *B); trailing batch dims are (LANE,)-tiled, or
    (SUB, LANE)-tiled with ``pack``. Returns K (H, c, n, *B), k (H, c, *B).
    """
    H = us.shape[0]
    n, c = 2 * m, CONTROL_DIM
    bs = _bshape(pack)
    nb = int(np_prod(ps.shape[2:])) // int(np_prod(bs))

    def blk(*lead):
        return tuple(lead) + bs

    def t_rev(b, t):
        return (H - 1 - t,) + (0,) * 1 + (b,) + (0,) * (len(bs) - 1)

    def t_rev_m(b, t):  # for 2-matrix-dim tensors (K)
        return (H - 1 - t, 0, 0, b) + (0,) * (len(bs) - 1)

    def term(b, t):
        return (H, 0, b) + (0,) * (len(bs) - 1)

    def const(b, t):
        return (0, b) + (0,) * (len(bs) - 1)

    sp = lambda s, fn: pl.BlockSpec(blk(1, s), fn, memory_space=pltpu.VMEM)
    spc = lambda s: pl.BlockSpec(blk(s), const, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_backward_sweep_kernel, m=m, q=q, r=r, rho=rho,
                          qe=qe, dt=dt, reg=reg),
        grid=(nb, H),
        in_specs=[
            sp(n, t_rev),            # ps (step t)
            sp(c, t_rev),            # us
            sp(c, t_rev),            # z
            sp(c, t_rev),            # y
            sp(n, t_rev),            # g
            sp(n, term),             # ps terminal  (block row H)
            sp(n, term),             # g terminal
            spc(n),                  # target
            spc(m),                  # inv_depth
        ],
        out_specs=(
            pl.BlockSpec(blk(1, c, n), t_rev_m, memory_space=pltpu.VMEM),
            sp(c, t_rev),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, c, n) + ps.shape[2:], jnp.float32),
            jax.ShapeDtypeStruct((H, c) + ps.shape[2:], jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n,) + bs, jnp.float32),
            pltpu.VMEM((n, n) + bs, jnp.float32),
        ],
        interpret=interpret_mode(),
    )(ps, us, z, y, g, ps, g, target, inv_depth)


@functools.partial(jax.jit, static_argnames=("m", "q", "r", "rho", "qe",
                                             "dt", "pack"))
def forward_sweep(p0, ps, us, K, k, z, y, g, target, inv_depth, *, m: int,
                  q: float, r: float, rho: float, qe: float, dt: float,
                  pack: bool = False):
    """Lanes-layout line-searched forward rollout.

    Returns (ps_c (H+1, A, n, *B), us_c (H, A, c, *B), J (A, *B)) where
    candidate 0 (alpha=0) is exactly the nominal trajectory/cost.
    """
    H = us.shape[0]
    n, c = 2 * m, CONTROL_DIM
    A = len(ALPHAS)
    bs = _bshape(pack)
    nb = int(np_prod(ps.shape[2:])) // int(np_prod(bs))

    def blk(*lead):
        return tuple(lead) + bs

    def t_fwd(b, t):
        return (t, 0, b) + (0,) * (len(bs) - 1)

    def t_fwd_m(b, t):
        return (t, 0, 0, b) + (0,) * (len(bs) - 1)

    def term(b, t):
        return (H, 0, b) + (0,) * (len(bs) - 1)

    def const(b, t):
        return (0, b) + (0,) * (len(bs) - 1)

    def outps(b, t):
        return (t + 1, 0, 0, b) + (0,) * (len(bs) - 1)

    def outJ(b, t):
        return (0, b) + (0,) * (len(bs) - 1)

    sp = lambda s, fn: pl.BlockSpec(blk(1, s), fn, memory_space=pltpu.VMEM)
    spc = lambda s: pl.BlockSpec(blk(s), const, memory_space=pltpu.VMEM)

    ps_c, us_c, J = pl.pallas_call(
        functools.partial(_forward_sweep_kernel, m=m, q=q, r=r, rho=rho,
                          qe=qe, dt=dt, horizon=H),
        grid=(nb, H),
        in_specs=[
            spc(n),                  # p0
            sp(n, t_fwd),            # ps nominal (step t)
            sp(c, t_fwd),            # us nominal
            pl.BlockSpec(blk(1, c, n), t_fwd_m,
                         memory_space=pltpu.VMEM),   # K
            sp(c, t_fwd),            # k
            sp(c, t_fwd),            # z
            sp(c, t_fwd),            # y
            sp(n, t_fwd),            # g
            sp(n, term),             # ps terminal (nominal)
            sp(n, term),             # g terminal
            spc(n),                  # target
            spc(m),                  # inv_depth
        ],
        out_specs=(
            pl.BlockSpec(blk(1, A, n), outps, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk(1, A, c), t_fwd_m, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk(A), outJ, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H + 1, A, n) + ps.shape[2:], jnp.float32),
            jax.ShapeDtypeStruct((H, A, c) + ps.shape[2:], jnp.float32),
            jax.ShapeDtypeStruct((A,) + ps.shape[2:], jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((A, n) + bs, jnp.float32),
            pltpu.VMEM((A,) + bs, jnp.float32),
        ],
        interpret=interpret_mode(),
    )(p0, ps, us, K, k, z, y, g, ps, g, target, inv_depth)
    # Row 0 of ps_c is never written by the kernel (outputs start at t+1);
    # every candidate starts at p0.
    ps0 = jnp.broadcast_to(p0[None, None], (1, A, n) + ps.shape[2:])
    ps_c = jnp.concatenate([ps0, ps_c[1:]], axis=0)
    return ps_c, us_c, J


def np_prod(t) -> int:
    out = 1
    for v in t:
        out *= int(v)
    return out


# ---------------------------------------------------------------------------
# Unified sweep: backward + forward in ONE kernel launch.
#
# Grid (batch_tiles, 2H): steps t < H run the backward recursion (time index
# H-1-t) writing the gains into VMEM scratch; steps t >= H run the
# line-searched forward rollout (time index t-H) reading them back — the
# gains never touch HBM and the per-sweep launch count halves. Output blocks
# are parked at index 0 during the backward phase (fetched and stored back
# unmodified — revisiting semantics make that a no-op) and written for real
# during the forward phase.
# ---------------------------------------------------------------------------


def _unified_sweep_kernel(p0_ref, ps_ref, us_ref, z_ref, y_ref, g_ref,
                          pterm_ref, gterm_ref, target_ref, izd_ref,
                          psout_ref, usout_ref, J_ref,
                          Vx_scr, Vxx_scr, K_scr, k_scr, p_scr, J_scr, *,
                          m: int, q: float, r: float, rho: float, qe: float,
                          dt: float, reg: float, horizon: int):
    n = 2 * m
    A = len(ALPHAS)
    H = horizon
    t = pl.program_id(1)
    target = target_ref[...]
    izd = izd_ref[...]
    bdims = len(target_ref.shape) - 1

    def _eye(k):
        shape = (k, k) + (1,) * bdims
        return (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                == jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                ).astype(jnp.float32)

    @pl.when(t == 0)
    def _():  # terminal expansion for the backward phase
        Vx_scr[...] = 2.0 * q * (pterm_ref[0] - target) \
            + qe * gterm_ref[0]
        Vxx_scr[...] = jnp.broadcast_to(2.0 * q * _eye(n), Vxx_scr.shape)

    @pl.when(t < H)
    def _backward():
        tau = H - 1 - t
        K, kff, Vx_new, Vxx_new = _backward_step(
            ps_ref[0], us_ref[0], z_ref[0], y_ref[0], g_ref[0], izd,
            target, Vx_scr[...], Vxx_scr[...], m=m, q=q, r=r, rho=rho,
            qe=qe, dt=dt, reg=reg, eye_fn=_eye)
        Vx_scr[...] = Vx_new
        Vxx_scr[...] = Vxx_new
        K_scr[pl.ds(tau, 1)] = K[None]
        k_scr[pl.ds(tau, 1)] = kff[None]

    @pl.when(t == H)
    def _():  # forward-phase init
        p_scr[...] = jnp.broadcast_to(p0_ref[...][None],
                                      (A,) + tuple(p0_ref.shape))
        J_scr[...] = jnp.zeros_like(J_scr)

    @pl.when(t >= H)
    def _forward():
        tau = t - H
        _forward_step(t, K_scr[tau], k_scr[tau], ps_ref[0], us_ref[0],
                      z_ref[0], y_ref[0], g_ref[0], izd, target,
                      pterm_ref[0], gterm_ref[0], psout_ref, usout_ref,
                      J_ref, p_scr, J_scr, m=m, q=q, r=r, rho=rho, qe=qe,
                      dt=dt, last_t=2 * H - 1)


@functools.partial(jax.jit, static_argnames=("m", "q", "r", "rho", "qe",
                                             "dt", "reg", "pack"))
def unified_sweep(p0, ps, us, z, y, g, target, inv_depth, *, m: int,
                  q: float, r: float, rho: float, qe: float, dt: float,
                  reg: float = 1e-6, pack: bool = False):
    """One-launch iLQR sweep: returns (ps_c, us_c, J) like forward_sweep."""
    H = us.shape[0]
    n, c = 2 * m, CONTROL_DIM
    A = len(ALPHAS)
    bs = _bshape(pack)
    nb = int(np_prod(ps.shape[2:])) // int(np_prod(bs))
    zt = (0,) * (len(bs) - 1)

    def blk(*lead):
        return tuple(lead) + bs

    def t_both(b, t):
        # backward phase streams time H-1-t; forward phase streams t-H
        return (jnp.where(t < H, H - 1 - t, t - H), 0, b) + zt

    def term(b, t):
        return (H, 0, b) + zt

    def const(b, t):
        return (0, b) + zt

    def outps(b, t):
        return (jnp.where(t < H, 0, t - H + 1), 0, 0, b) + zt

    def outus(b, t):
        return (jnp.where(t < H, 0, t - H), 0, 0, b) + zt

    def outJ(b, t):
        return (0, b) + zt

    sp = lambda s, fn: pl.BlockSpec(blk(1, s), fn, memory_space=pltpu.VMEM)
    spc = lambda s: pl.BlockSpec(blk(s), const, memory_space=pltpu.VMEM)

    ps_c, us_c, J = pl.pallas_call(
        functools.partial(_unified_sweep_kernel, m=m, q=q, r=r, rho=rho,
                          qe=qe, dt=dt, reg=reg, horizon=H),
        grid=(nb, 2 * H),
        in_specs=[
            spc(n),                  # p0
            sp(n, t_both),           # ps
            sp(c, t_both),           # us
            sp(c, t_both),           # z
            sp(c, t_both),           # y
            sp(n, t_both),           # g
            sp(n, term),             # ps terminal
            sp(n, term),             # g terminal
            spc(n),                  # target
            spc(m),                  # inv_depth
        ],
        out_specs=(
            pl.BlockSpec(blk(1, A, n), outps, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk(1, A, c), outus, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk(A), outJ, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H + 1, A, n) + ps.shape[2:], jnp.float32),
            jax.ShapeDtypeStruct((H, A, c) + ps.shape[2:], jnp.float32),
            jax.ShapeDtypeStruct((A,) + ps.shape[2:], jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n,) + bs, jnp.float32),        # Vx
            pltpu.VMEM((n, n) + bs, jnp.float32),      # Vxx
            pltpu.VMEM((H, c, n) + bs, jnp.float32),   # gains K
            pltpu.VMEM((H, c) + bs, jnp.float32),      # gains k
            pltpu.VMEM((A, n) + bs, jnp.float32),      # candidate states
            pltpu.VMEM((A,) + bs, jnp.float32),        # running costs
        ],
        interpret=interpret_mode(),
    )(p0, ps, us, z, y, g, ps, g, target, inv_depth)
    ps0 = jnp.broadcast_to(p0[None, None], (1, A, n) + ps.shape[2:])
    ps_c = jnp.concatenate([ps0, ps_c[1:]], axis=0)
    return ps_c, us_c, J

# ---------------------------------------------------------------------------
# Multi-sweep kernel: ALL iLQR sweeps of one ADMM iteration in ONE launch.
#
# Requires the per-ADMM edge-linearization schedule (config
# edge_refresh="admm"): with g fixed across the sweeps, nothing between
# consecutive sweeps needs XLA, so backward + line-searched forward +
# winner selection can loop entirely in VMEM. Grid (batch_tiles,
# sweeps*(2H+1)); each sweep runs two phases of H steps plus one:
#
#   B (local <  H): Riccati backward at tau = H-1-local — gains to scratch.
#   F (local < 2H): 4-candidate rollout at tau = local-H. Candidate
#       controls AND states for alpha != 0 go to scratch (alpha=0
#       reproduces the nominal exactly, so it needs no storage); running
#       costs accumulate in scratch.
#   S (local == 2H): first-wins argmin pick (NaN-guarded, exactly
#       solver.pick's semantics), then the winner's whole stored
#       trajectory/controls are mask-selected into the output blocks in
#       this ONE step. The old design re-rolled the winner over H more
#       grid steps — the stored candidate trajectory is bit-identical to
#       that re-roll (same _dyn_step chain), so dropping the R phase cuts
#       a third of the grid at no numerical cost. Masked jnp.where (not a
#       one-hot contraction) keeps a non-finite loser from contaminating
#       the winner via 0*NaN.
#
# The output blocks (whole (H+1, n) / (H, c) arrays per batch tile, block
# index constant in t) stay VMEM-resident across the sweep loop and serve
# as the nominal-trajectory storage: sweep 0's backward pass seeds them
# from the streamed inputs, each select step overwrites them with the
# winner, and Mosaic flushes them to HBM when the batch tile advances.
# ---------------------------------------------------------------------------


def _forward_cand_step(tau, K, kff, p_nom, u_nom, z_t, y_t, g_t, izd,
                       target, p_scr, J_scr, pc_scr, uc_scr, *, m: int,
                       q: float, r: float, rho: float, qe: float,
                       dt: float):
    """One forward step of the A-candidate line search (shared by the
    multi-sweep and full-solve kernels): advance every candidate state,
    accumulate its stage cost, and store the non-nominal candidates'
    controls/states for the winner select."""
    n = 2 * m
    for a_idx, alpha in enumerate(ALPHAS):
        p_a = p_scr[a_idx]
        u_a = u_nom + alpha * kff + _mv(K, p_a - p_nom, n)
        J_add = (q * jnp.sum((p_a - target) ** 2, axis=0)
                 + r * jnp.sum(u_a ** 2, axis=0)
                 + 0.5 * rho * jnp.sum((u_a - z_t + y_t) ** 2, axis=0)
                 + qe * jnp.sum(g_t * (p_a - p_nom), axis=0))
        J_scr[a_idx] = J_scr[a_idx] + J_add
        p_next = _dyn_step(p_a, u_a, izd, dt, m)
        p_scr[a_idx] = p_next
        if a_idx:
            uc_scr[a_idx - 1, pl.ds(tau, 1)] = u_a[None]
            pc_scr[a_idx - 1, pl.ds(tau, 1)] = p_next[None]


def _terminal_cost_accum(pterm, gterm, target, p_scr, J_scr, *, q: float,
                         qe: float):
    """Add the terminal tracking + linearized-edge cost of every candidate
    into its running total (shared by the multi-sweep/full-solve kernels)."""
    for a_idx in range(len(ALPHAS)):
        p_h = p_scr[a_idx]
        J_scr[a_idx] = (J_scr[a_idx]
                        + q * jnp.sum((p_h - target) ** 2, axis=0)
                        + qe * jnp.sum(gterm * (p_h - pterm), axis=0))


def _select_winner(J, ps_nom_rows, us_nom, pc_scr, uc_scr):
    """Whole-trajectory winner select, first-wins argmin over candidates.

    Non-finite J is masked to +inf so a NaN-poisoned candidate can never
    win (the alpha=0 nominal stays); the masked-``where`` chain (never a
    one-hot contraction — 0*NaN from a LOSING candidate would poison the
    winner) overwrites the nominal rows with the winner's stored
    trajectory. Returns (ps rows 1..H, us). Shared by the multi-sweep and
    full-solve kernels; ``solver.pick`` implements the same contract for
    the per-sweep path."""
    J = jnp.where(jnp.isfinite(J), J, jnp.inf)
    Jmin = jnp.min(J, axis=0)
    taken = jnp.zeros_like(Jmin, dtype=jnp.bool_)
    masks = []
    for a_idx in range(len(ALPHAS)):
        hit = (J[a_idx] == Jmin) & ~taken
        masks.append(hit)
        taken = taken | hit
    ps_w = ps_nom_rows
    us_w = us_nom
    for a_idx in range(1, len(ALPHAS)):
        mk = masks[a_idx][None, None]
        ps_w = jnp.where(mk, pc_scr[a_idx - 1], ps_w)
        us_w = jnp.where(mk, uc_scr[a_idx - 1], us_w)
    return ps_w, us_w


def _multi_sweep_kernel(p0_ref, ps_ref, us_ref, z_ref, y_ref, g_ref,
                        pterm_ref, gterm_ref, target_ref, izd_ref,
                        psout_ref, usout_ref,
                        Vx_scr, Vxx_scr, K_scr, k_scr,
                        pc_scr, uc_scr, p_scr, J_scr, *,
                        m: int, q: float, r: float, rho: float, qe: float,
                        dt: float, reg: float, horizon: int):
    n = 2 * m
    A = len(ALPHAS)
    H = horizon
    P = 2 * H + 1
    t = pl.program_id(1)
    local = t % P
    first = t < P
    target = target_ref[...]
    izd = izd_ref[...]
    bdims = len(target_ref.shape) - 1

    def _eye(k):
        shape = (k, k) + (1,) * bdims
        return (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                == jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                ).astype(jnp.float32)

    @pl.when(local == 0)
    def _():  # terminal expansion; sweep 0 seeds the resident nominal
        pterm = jnp.where(first, pterm_ref[0], psout_ref[H])

        @pl.when(first)
        def _():
            psout_ref[pl.ds(H, 1)] = pterm_ref[...]

        Vx_scr[...] = 2.0 * q * (pterm - target) + qe * gterm_ref[0]
        Vxx_scr[...] = jnp.broadcast_to(2.0 * q * _eye(n), Vxx_scr.shape)

    @pl.when(local < H)
    def _backward():
        tau = H - 1 - local
        p_t = jnp.where(first, ps_ref[0], psout_ref[tau])
        u_t = jnp.where(first, us_ref[0], usout_ref[tau])

        @pl.when(first)
        def _():  # seed the resident nominal from the stream
            psout_ref[pl.ds(tau, 1)] = p_t[None]
            usout_ref[pl.ds(tau, 1)] = u_t[None]

        K, kff, Vx_new, Vxx_new = _backward_step(
            p_t, u_t, z_ref[0], y_ref[0], g_ref[0], izd, target,
            Vx_scr[...], Vxx_scr[...], m=m, q=q, r=r, rho=rho, qe=qe,
            dt=dt, reg=reg, eye_fn=_eye)
        Vx_scr[...] = Vx_new
        Vxx_scr[...] = Vxx_new
        K_scr[pl.ds(tau, 1)] = K[None]
        k_scr[pl.ds(tau, 1)] = kff[None]

    @pl.when(local == H)
    def _():  # forward-phase init
        p_scr[...] = jnp.broadcast_to(p0_ref[...][None],
                                      (A,) + tuple(p0_ref.shape))
        J_scr[...] = jnp.zeros_like(J_scr)

    @pl.when((local >= H) & (local < 2 * H))
    def _forward():
        tau = local - H
        _forward_cand_step(tau, K_scr[tau], k_scr[tau], psout_ref[tau],
                           usout_ref[tau], z_ref[0], y_ref[0], g_ref[0],
                           izd, target, p_scr, J_scr, pc_scr, uc_scr,
                           m=m, q=q, r=r, rho=rho, qe=qe, dt=dt)

        @pl.when(local == 2 * H - 1)
        def _():  # terminal cost into the running totals
            _terminal_cost_accum(psout_ref[H], gterm_ref[0], target,
                                 p_scr, J_scr, q=q, qe=qe)

    @pl.when(local == 2 * H)
    def _select():  # pick + whole-trajectory winner selection, one step
        ps_w, us_w = _select_winner(J_scr[...], psout_ref[pl.ds(1, H)],
                                    usout_ref[...], pc_scr, uc_scr)
        psout_ref[pl.ds(1, H)] = ps_w
        usout_ref[...] = us_w
        psout_ref[pl.ds(0, 1)] = p0_ref[...][None]


# ---------------------------------------------------------------------------
# Full-solve kernel: the ENTIRE ADMM solve in ONE launch.
#
# Requires the per-solve edge-linearization schedule (config
# edge_refresh="solve"): with g fixed for the whole solve, nothing between
# ADMM iterations needs XLA either — the z/y dual updates are elementwise on
# (H, c) state that lives in VMEM scratch across the whole grid. Layout:
#
#   grid (batch_tiles, admm_iters * sweeps * (2H+1)  +  H)
#
# The solve region replays the multi-sweep phases (B/F/S per sweep — the
# same stored-candidate winner select as ``_multi_sweep_kernel``, with the
# nominal resident in scratch rather than the output block since the
# outputs here stream row-by-row in the trailing phase); at the select
# step of each ADMM iteration's final sweep the projection z = clip(us+y)
# and dual ascent y += us - z update scratch in place. The trailing H
# steps roll the final feasible controls z out from p0, streaming the
# trajectory, z, and the unprojected controls to the outputs (parked at
# block 0 until then). Replaces per solve: admm_iters multi-sweep
# launches, the final feasible-rollout launch, and all the XLA clip/dual
# glue — the whole ADMM loop becomes one kernel launch.
#
# z/y initialization rides sweep 0's backward phase: at step local the
# recursion needs (z, y) only at tau = H-1-local, so z_scr[tau] =
# clip(us0[tau]) / y_scr[tau] = 0 is written right before first use.
# ---------------------------------------------------------------------------


def _full_solve_kernel(p0_ref, ps_ref, us_ref, g_ref, pterm_ref, gterm_ref,
                       target_ref, izd_ref,
                       psout_ref, zout_ref, ulout_ref,
                       Vx_scr, Vxx_scr, K_scr, k_scr, ps_scr, us_scr,
                       pc_scr, uc_scr, p_scr, J_scr, pcur_scr, z_scr, y_scr,
                       *, m: int, q: float, r: float, rho: float, qe: float,
                       dt: float, reg: float, horizon: int, sweeps: int,
                       admm_iters: int, u_limit: float, relax: float):
    n = 2 * m
    A = len(ALPHAS)
    H = horizon
    P = 2 * H + 1
    MSP = admm_iters * sweeps * P
    t = pl.program_id(1)
    local = t % P
    first = t < P
    in_solve = t < MSP
    last_of_admm = (t // P) % sweeps == sweeps - 1
    target = target_ref[...]
    izd = izd_ref[...]
    bdims = len(target_ref.shape) - 1

    def _eye(k):
        shape = (k, k) + (1,) * bdims
        return (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                == jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                ).astype(jnp.float32)

    @pl.when(in_solve & (local == 0))
    def _():  # terminal expansion; sweep 0 seeds the resident nominal
        pterm = jnp.where(first, pterm_ref[0], ps_scr[H])

        @pl.when(first)
        def _():
            ps_scr[pl.ds(H, 1)] = pterm_ref[...]

        Vx_scr[...] = 2.0 * q * (pterm - target) + qe * gterm_ref[0]
        Vxx_scr[...] = jnp.broadcast_to(2.0 * q * _eye(n), Vxx_scr.shape)

    @pl.when(in_solve & (local < H))
    def _backward():
        tau = H - 1 - local
        p_t = jnp.where(first, ps_ref[0], ps_scr[tau])
        u_t = jnp.where(first, us_ref[0], us_scr[tau])

        @pl.when(first)
        def _():  # ADMM state init z0 = clip(us0), y0 = 0, just in time;
            # seed the resident nominal from the stream
            z_scr[pl.ds(tau, 1)] = jnp.clip(us_ref[...], -u_limit, u_limit)
            y_scr[pl.ds(tau, 1)] = jnp.zeros_like(us_ref[...])
            ps_scr[pl.ds(tau, 1)] = p_t[None]
            us_scr[pl.ds(tau, 1)] = u_t[None]

        K, kff, Vx_new, Vxx_new = _backward_step(
            p_t, u_t, z_scr[tau], y_scr[tau], g_ref[0], izd, target,
            Vx_scr[...], Vxx_scr[...], m=m, q=q, r=r, rho=rho, qe=qe,
            dt=dt, reg=reg, eye_fn=_eye)
        Vx_scr[...] = Vx_new
        Vxx_scr[...] = Vxx_new
        K_scr[pl.ds(tau, 1)] = K[None]
        k_scr[pl.ds(tau, 1)] = kff[None]

    @pl.when(in_solve & (local == H))
    def _():  # forward-phase init
        p_scr[...] = jnp.broadcast_to(p0_ref[...][None],
                                      (A,) + tuple(p0_ref.shape))
        J_scr[...] = jnp.zeros_like(J_scr)

    @pl.when(in_solve & (local >= H) & (local < 2 * H))
    def _forward():
        tau = local - H
        p_nom = jnp.where(first, ps_ref[0], ps_scr[tau])
        u_nom = jnp.where(first, us_ref[0], us_scr[tau])
        _forward_cand_step(tau, K_scr[tau], k_scr[tau], p_nom, u_nom,
                           z_scr[tau], y_scr[tau], g_ref[0],
                           izd, target, p_scr, J_scr, pc_scr, uc_scr,
                           m=m, q=q, r=r, rho=rho, qe=qe, dt=dt)

        @pl.when(local == 2 * H - 1)
        def _():  # terminal cost into the running totals
            _terminal_cost_accum(ps_scr[H], gterm_ref[0], target,
                                 p_scr, J_scr, q=q, qe=qe)

    @pl.when(in_solve & (local == 2 * H))
    def _select():  # pick + whole-trajectory winner selection, one step
        ps_w, us_w = _select_winner(J_scr[...], ps_scr[pl.ds(1, H)],
                                    us_scr[...], pc_scr, uc_scr)
        ps_scr[pl.ds(1, H)] = ps_w
        us_scr[...] = us_w
        ps_scr[pl.ds(0, 1)] = p0_ref[...][None]

    @pl.when(in_solve & (local == P - 1) & last_of_admm)
    def _admm_update():  # projection + dual ascent on the whole horizon
        # (fires at the select step, textually AFTER it so the selected
        # us_scr is the one projected). Over-relaxation (relax is a static
        # Python float; 1.0 keeps the plain-ADMM graph bit-identical):
        # u_hat = relax*us + (1-relax)*z_prev, matching the XLA-side
        # admm_body in every solver backend.
        uh = (us_scr[...] if relax == 1.0
              else relax * us_scr[...] + (1.0 - relax) * z_scr[...])
        z_new = jnp.clip(uh + y_scr[...], -u_limit, u_limit)
        y_scr[...] = y_scr[...] + uh - z_new
        z_scr[...] = z_new

    @pl.when(t == MSP)
    def _():  # feasible-rollout init
        pcur_scr[...] = p0_ref[...]

    @pl.when(t >= MSP)
    def _feasible():
        tau = t - MSP
        u_t = z_scr[tau]
        p_next = _dyn_step(pcur_scr[...], u_t, izd, dt, m)
        pcur_scr[...] = p_next
        psout_ref[0] = p_next
        zout_ref[0] = u_t
        ulout_ref[0] = us_scr[tau]


@functools.partial(jax.jit, static_argnames=(
    "m", "q", "r", "rho", "qe", "dt", "reg", "sweeps", "admm_iters",
    "u_limit", "relax", "pack"))
def full_solve(p0, ps, us, g, target, inv_depth, *, m: int, q: float,
               r: float, rho: float, qe: float, dt: float, sweeps: int,
               admm_iters: int, u_limit: float, reg: float = 1e-6,
               relax: float = 1.0, pack: bool = False):
    """The whole ADMM solve in ONE launch (fixed edge linearization ``g``,
    i.e. config edge_refresh="solve"). Same math as ``admm_iters`` rounds of
    ``multi_sweep`` + z/y projection/dual updates, then the feasible
    rollout of z — equivalence-tested against that chain.

    Returns (ps_final (H+1, n, *B) — row 0 is p0, z (H, c, *B) feasible
    controls, us (H, c, *B) final unprojected controls).
    """
    H = us.shape[0]
    n, c = 2 * m, CONTROL_DIM
    A = len(ALPHAS)
    bs = _bshape(pack)
    nb = int(np_prod(ps.shape[2:])) // int(np_prod(bs))
    zt = (0,) * (len(bs) - 1)
    P = 2 * H + 1
    MSP = admm_iters * sweeps * P

    def blk(*lead):
        return tuple(lead) + bs

    def t_stream(b, t):
        local = t % P
        idx = jnp.where(
            t >= MSP, 0,
            jnp.where(local < H, H - 1 - local,
                      jnp.where(local < 2 * H, local - H, 0)))
        return (idx, 0, b) + zt

    def term(b, t):
        return (H, 0, b) + zt

    def const(b, t):
        return (0, b) + zt

    def outps(b, t):
        return (jnp.where(t >= MSP, t - MSP + 1, 0), 0, b) + zt

    def outu(b, t):
        return (jnp.where(t >= MSP, t - MSP, 0), 0, b) + zt

    sp = lambda s, fn: pl.BlockSpec(blk(1, s), fn, memory_space=pltpu.VMEM)
    spc = lambda s: pl.BlockSpec(blk(s), const, memory_space=pltpu.VMEM)

    ps_out, z_out, ul_out = pl.pallas_call(
        functools.partial(_full_solve_kernel, m=m, q=q, r=r, rho=rho,
                          qe=qe, dt=dt, reg=reg, horizon=H, sweeps=sweeps,
                          admm_iters=admm_iters, u_limit=u_limit,
                          relax=relax),
        grid=(nb, MSP + H),
        in_specs=[
            spc(n),                  # p0
            sp(n, t_stream),         # ps nominal (sweep 0)
            sp(c, t_stream),         # us nominal (sweep 0)
            sp(n, t_stream),         # g (fixed linearization)
            sp(n, term),             # ps terminal (sweep 0)
            sp(n, term),             # g terminal
            spc(n),                  # target
            spc(m),                  # inv_depth
        ],
        out_specs=(
            pl.BlockSpec(blk(1, n), outps, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk(1, c), outu, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk(1, c), outu, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H + 1, n) + ps.shape[2:], jnp.float32),
            jax.ShapeDtypeStruct((H, c) + ps.shape[2:], jnp.float32),
            jax.ShapeDtypeStruct((H, c) + ps.shape[2:], jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n,) + bs, jnp.float32),        # Vx
            pltpu.VMEM((n, n) + bs, jnp.float32),      # Vxx
            pltpu.VMEM((H, c, n) + bs, jnp.float32),   # gains K
            pltpu.VMEM((H, c) + bs, jnp.float32),      # gains k
            pltpu.VMEM((H + 1, n) + bs, jnp.float32),  # nominal trajectory
            pltpu.VMEM((H, c) + bs, jnp.float32),      # nominal controls
            pltpu.VMEM((A - 1, H, n) + bs, jnp.float32),  # cand trajectories
            pltpu.VMEM((A - 1, H, c) + bs, jnp.float32),  # cand controls
            pltpu.VMEM((A, n) + bs, jnp.float32),      # candidate states
            pltpu.VMEM((A,) + bs, jnp.float32),        # running costs
            pltpu.VMEM((n,) + bs, jnp.float32),        # feasible-rollout state
            pltpu.VMEM((H, c) + bs, jnp.float32),      # ADMM z
            pltpu.VMEM((H, c) + bs, jnp.float32),      # ADMM y
        ],
        interpret=interpret_mode(),
    )(p0, ps, us, g, ps, g, target, inv_depth)
    ps0 = jnp.broadcast_to(p0[None], (1, n) + ps.shape[2:])
    return jnp.concatenate([ps0, ps_out[1:]], axis=0), z_out, ul_out


@functools.partial(jax.jit, static_argnames=("m", "q", "r", "rho", "qe",
                                             "dt", "reg", "sweeps", "pack"))
def multi_sweep(p0, ps, us, z, y, g, target, inv_depth, *, m: int,
                q: float, r: float, rho: float, qe: float, dt: float,
                sweeps: int, reg: float = 1e-6, pack: bool = False):
    """All `sweeps` iLQR iterations of one ADMM step in ONE launch.

    Same math as `sweeps` rounds of ``unified_sweep`` + ``solver.pick``
    with a FIXED edge linearization ``g`` (edge_refresh="admm");
    equivalence-tested against that path. Returns the final nominal
    (ps (H+1, n, *B) — row 0 is p0, us (H, c, *B)).
    """
    H = us.shape[0]
    n, c = 2 * m, CONTROL_DIM
    A = len(ALPHAS)
    bs = _bshape(pack)
    nb = int(np_prod(ps.shape[2:])) // int(np_prod(bs))
    zt = (0,) * (len(bs) - 1)
    P = 2 * H + 1                               # grid steps per sweep

    def blk(*lead):
        return tuple(lead) + bs

    def t_stream(b, t):
        # B phase: H-1-local; F phase: local-H; S step: park at 0
        local = t % P
        return (jnp.where(local < H, H - 1 - local,
                          jnp.where(local < 2 * H, local - H, 0)),
                0, b) + zt

    def term(b, t):
        return (H, 0, b) + zt

    def const(b, t):
        return (0, b) + zt

    def whole(b, t):
        return (0, 0, b) + zt

    sp = lambda s, fn: pl.BlockSpec(blk(1, s), fn, memory_space=pltpu.VMEM)
    spc = lambda s: pl.BlockSpec(blk(s), const, memory_space=pltpu.VMEM)

    ps_out, us_out = pl.pallas_call(
        functools.partial(_multi_sweep_kernel, m=m, q=q, r=r, rho=rho,
                          qe=qe, dt=dt, reg=reg, horizon=H),
        grid=(nb, sweeps * P),
        in_specs=[
            spc(n),                  # p0
            sp(n, t_stream),         # ps nominal (sweep 0)
            sp(c, t_stream),         # us nominal (sweep 0)
            sp(c, t_stream),         # z
            sp(c, t_stream),         # y
            sp(n, t_stream),         # g (fixed linearization)
            sp(n, term),             # ps terminal (sweep 0)
            sp(n, term),             # g terminal
            spc(n),                  # target
            spc(m),                  # inv_depth
        ],
        # Whole-array output blocks, VMEM-resident per batch tile: they
        # double as the nominal-trajectory storage across sweeps.
        out_specs=(
            pl.BlockSpec(blk(H + 1, n), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk(H, c), whole, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H + 1, n) + ps.shape[2:], jnp.float32),
            jax.ShapeDtypeStruct((H, c) + ps.shape[2:], jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n,) + bs, jnp.float32),        # Vx
            pltpu.VMEM((n, n) + bs, jnp.float32),      # Vxx
            pltpu.VMEM((H, c, n) + bs, jnp.float32),   # gains K
            pltpu.VMEM((H, c) + bs, jnp.float32),      # gains k
            pltpu.VMEM((A - 1, H, n) + bs, jnp.float32),  # cand trajectories
            pltpu.VMEM((A - 1, H, c) + bs, jnp.float32),  # cand controls
            pltpu.VMEM((A, n) + bs, jnp.float32),      # candidate states
            pltpu.VMEM((A,) + bs, jnp.float32),        # running costs
        ],
        interpret=interpret_mode(),
    )(p0, ps, us, z, y, g, ps, g, target, inv_depth)
    return ps_out, us_out
