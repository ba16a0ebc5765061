"""Online system identification: learn feature depths from observed motion.

The IBVS dynamics depend on per-feature depths Z that a real camera does not
observe directly. This module fits the inverse depths by gradient descent on
the one-step prediction error through the differentiable dynamics — the
framework's *training* path: an optax optimizer, a jitted train step whose
gradients average over the scenario batch (and, under pjit with a sharded
batch, across the mesh via an XLA-inserted psum), and checkpointable state.

Parametrization: theta = log(1/Z) per feature (keeps Z positive and the
step well-scaled across depth magnitudes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from openmp_parallel_computing_tpu.models.mpc import dynamics


class SysIdState(NamedTuple):
    log_inv_depth: jax.Array     # (B, m)
    opt_state: optax.OptState


class DepthEstimator:
    """Fits per-scenario feature depths from (p_t, u_t, p_{t+1}) tuples."""

    def __init__(self, num_features: int, dt: float, lr: float = 0.1):
        self.m = num_features
        self.dt = dt
        self.opt = optax.adam(lr)

    def init(self, batch: int, z0: float = 2.0) -> SysIdState:
        log_iz = jnp.full((batch, self.m), -jnp.log(z0), jnp.float32)
        return SysIdState(log_iz, self.opt.init(log_iz))

    def depths(self, state: SysIdState) -> jax.Array:
        return jnp.exp(-state.log_inv_depth)

    def _loss(self, log_iz, p, u, p_next):
        """Mean squared one-step prediction error over batch and features.

        p/u/p_next: (B, T, 2m) / (B, T, 6) observation windows.
        """
        depth = jnp.exp(-log_iz)                       # (B, m)

        def per_scen(pb, ub, db):
            pred = jax.vmap(lambda pp, uu: dynamics.step(pp, uu, db,
                                                         self.dt))(pb, ub)
            return pred

        pred = jax.vmap(per_scen)(p, u, depth)
        return jnp.mean((pred - p_next) ** 2)

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: SysIdState, p, u, p_next):
        """One optimizer step; returns (new_state, loss). Under pjit with
        the batch sharded over the mesh the gradient mean reduces with a
        psum — the framework's distributed-training pattern."""
        loss, grads = jax.value_and_grad(self._loss)(
            state.log_inv_depth, p, u, p_next)
        updates, opt_state = self.opt.update(grads, state.opt_state)
        return SysIdState(
            optax.apply_updates(state.log_inv_depth, updates),
            opt_state), loss

    def fit(self, p, u, p_next, steps: int = 200,
            state: SysIdState | None = None):
        """Run ``steps`` train steps; returns (state, loss history)."""
        state = state or self.init(p.shape[0])

        def body(s, _):
            s, loss = self.train_step(s, p, u, p_next)
            return s, loss

        return jax.lax.scan(body, state, None, length=steps)
