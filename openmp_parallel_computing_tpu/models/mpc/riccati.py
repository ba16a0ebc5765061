"""Time-varying LQR machinery: quadratic expansion, Riccati backward sweep,
gain-feedback forward rollout — all as ``lax.scan`` programs.

The backward recursion is the block-structured QP solve of the BASELINE
north star ("ADMM/Riccati sweep over the horizon"): for the batched MPC each
per-step operation is a small (2m x 2m / 2m x 6) matrix product which, once
vmapped over hundreds of scenarios, becomes large batched matmuls that XLA
lays onto the MXU.

Conventions: state dim n, control dim c, horizon H.
- dynamics jacobians  fx (H, n, n), fu (H, n, c)
- cost expansions     lx (H, n), lu (H, c), lxx (H, n, n), luu (H, c, c),
                      lux (H, c, n); terminal vx (n,), vxx (n, n)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Gains(NamedTuple):
    K: jax.Array      # (H, c, n) feedback
    k: jax.Array      # (H, c) feedforward
    dV: jax.Array     # (2,) expected cost decrease coefficients


def spd_solve(A: jax.Array, B: jax.Array) -> jax.Array:
    """Solve A X = B for small SPD A via fully unrolled Cholesky.

    A (..., n, n), B (..., n, k) with n known statically and small (the
    control dimension, 6). Every operation is a batched elementwise op or
    tiny contraction — on TPU this runs far faster than the batched LU of
    ``jnp.linalg.solve`` (pivoting lowers to long scalarized sequences)
    while vmapping cleanly over scenario batches.
    """
    n = A.shape[-1]
    # Cholesky: L rows built column-by-column, kept as a list of (.., n)
    # row vectors to avoid materializing scatter updates.
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for p in range(j):
            s = s - L[j][p] * L[j][p]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            L[i][j] = s * inv_d
    # Forward substitution: L Y = B  (Y rows (..., k)).
    Y = [None] * n
    for i in range(n):
        s = B[..., i, :]
        for p in range(i):
            s = s - L[i][p][..., None] * Y[p]
        Y[i] = s / L[i][i][..., None]
    # Backward substitution: L^T X = Y.
    X = [None] * n
    for i in reversed(range(n)):
        s = Y[i]
        for p in range(i + 1, n):
            s = s - L[p][i][..., None] * X[p]
        X[i] = s / L[i][i][..., None]
    return jnp.stack(X, axis=-2)


def backward(fx, fu, lx, lu, lxx, luu, lux, vx, vxx,
             reg: float = 1e-6) -> Gains:
    """Riccati backward sweep; returns time-varying affine gains."""

    def step(carry, inp):
        Vx, Vxx, dv1, dv2 = carry
        fx_k, fu_k, lx_k, lu_k, lxx_k, luu_k, lux_k = inp
        Vxx_fx = Vxx @ fx_k                 # shared by Qxx and Qux
        Vxx_fu = Vxx @ fu_k                 # shared by Quu
        Qx = lx_k + fx_k.T @ Vx
        Qu = lu_k + fu_k.T @ Vx
        Qxx = lxx_k + fx_k.T @ Vxx_fx
        Quu = luu_k + fu_k.T @ Vxx_fu
        Qux = lux_k + fu_k.T @ Vxx_fx
        Quu_reg = Quu + reg * jnp.eye(Quu.shape[0], dtype=Quu.dtype)
        # One joint SPD solve for [k | K]; unrolled Cholesky (see spd_solve).
        sol = -spd_solve(
            Quu_reg, jnp.concatenate([Qu[..., None], Qux], axis=-1))
        kff = sol[..., 0]
        K = sol[..., 1:]
        Vx_new = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
        Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        dv1 = dv1 + kff @ Qu
        dv2 = dv2 + 0.5 * kff @ Quu @ kff
        return (Vx_new, Vxx_new, dv1, dv2), (K, kff)

    init = (vx, vxx, jnp.zeros((), vx.dtype), jnp.zeros((), vx.dtype))
    (_, _, dv1, dv2), (Ks, ks) = jax.lax.scan(
        step, init, (fx, fu, lx, lu, lxx, luu, lux), reverse=True,
        unroll=4)
    return Gains(K=Ks, k=ks, dV=jnp.stack([dv1, dv2]))


def forward(step_fn, p0, ps_nom, us_nom, gains: Gains, alpha):
    """Closed-loop rollout with the affine policy
    u = u_nom + alpha * k + K (p - p_nom)."""

    def body(p, inp):
        p_nom, u_nom, K, kff = inp
        u = u_nom + alpha * kff + K @ (p - p_nom)
        nxt = step_fn(p, u)
        return nxt, (nxt, u)

    _, (ps, us) = jax.lax.scan(body, p0, (ps_nom[:-1], us_nom, gains.K,
                                          gains.k), unroll=4)
    return jnp.concatenate([p0[None], ps], axis=0), us


def expand_costs(stage_cost, terminal_cost, ps, us):
    """Autodiff quadratic expansion of the costs along a trajectory.

    ps (H+1, n), us (H, c) -> (lx, lu, lxx, luu, lux, vx, vxx) plus the
    total trajectory cost.
    """
    lx = jax.vmap(jax.grad(stage_cost, argnums=0))(ps[:-1], us)
    lu = jax.vmap(jax.grad(stage_cost, argnums=1))(ps[:-1], us)
    lxx = jax.vmap(jax.hessian(stage_cost, argnums=0))(ps[:-1], us)
    luu = jax.vmap(jax.hessian(stage_cost, argnums=1))(ps[:-1], us)
    lux = jax.vmap(jax.jacrev(jax.grad(stage_cost, argnums=1),
                              argnums=0))(ps[:-1], us)
    vx = jax.grad(terminal_cost)(ps[-1])
    vxx = jax.hessian(terminal_cost)(ps[-1])
    total = (jax.vmap(stage_cost)(ps[:-1], us).sum()
             + terminal_cost(ps[-1]))
    return lx, lu, lxx, luu, lux, vx, vxx, total


def trajectory_cost(stage_cost, terminal_cost, ps, us):
    return jax.vmap(stage_cost)(ps[:-1], us).sum() + terminal_cost(ps[-1])
