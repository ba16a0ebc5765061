"""System-identification tests: depth recovery from synthetic rollouts and
the sharded training step."""

import jax
import jax.numpy as jnp
import numpy as np

from openmp_parallel_computing_tpu.models.mpc import dynamics
from openmp_parallel_computing_tpu.models.mpc.sysid import DepthEstimator


def synth_data(key, batch, m, steps, dt, depth):
    """Roll true dynamics with random controls -> (p, u, p_next)."""
    k1, k2 = jax.random.split(key)
    p0 = jax.random.uniform(k1, (batch, 2 * m), minval=-0.5, maxval=0.5)
    us = jax.random.uniform(k2, (batch, steps, 6), minval=-1.0, maxval=1.0)

    def roll(p0b, usb, db):
        ps = dynamics.rollout(p0b, usb, db, dt)
        return ps

    ps = jax.vmap(roll)(p0, us, depth)
    return ps[:, :-1], us, ps[:, 1:]


class TestDepthEstimation:
    def test_recovers_true_depths(self):
        m, batch, dt = 3, 4, 1.0 / 30.0
        key = jax.random.PRNGKey(0)
        true_depth = jnp.asarray(
            np.random.default_rng(1).uniform(1.0, 4.0, (batch, m)),
            jnp.float32)
        p, u, p_next = synth_data(key, batch, m, 30, dt, true_depth)
        est = DepthEstimator(m, dt, lr=0.2)
        state, losses = est.fit(p, u, p_next, steps=300)
        got = np.asarray(est.depths(state))
        rel = np.abs(got - np.asarray(true_depth)) / np.asarray(true_depth)
        assert float(losses[-1]) < float(losses[0]) * 1e-2
        assert rel.max() < 0.15, f"depth error too large: {rel}"

    def test_train_step_jit_and_shapes(self):
        m, batch = 2, 8
        est = DepthEstimator(m, 0.05)
        state = est.init(batch)
        p = jnp.zeros((batch, 5, 2 * m))
        u = jnp.zeros((batch, 5, 6))
        state2, loss = est.train_step(state, p, u, p)
        assert state2.log_inv_depth.shape == (batch, m)
        assert np.isfinite(float(loss))

    def test_sharded_training_step(self):
        """Gradient step with the observation batch sharded over the mesh
        (the dp training pattern: XLA inserts the gradient psum)."""
        from openmp_parallel_computing_tpu import parallel

        mesh = parallel.make_mesh(data=8, model=1)
        m, batch, dt = 2, 16, 1.0 / 30.0
        true_depth = jnp.full((batch, m), 2.5)
        p, u, p_next = synth_data(jax.random.PRNGKey(3), batch, m, 10, dt,
                                  true_depth)
        shard = parallel.data_sharding(mesh)
        p, u, p_next = (jax.device_put(x, shard) for x in (p, u, p_next))
        est = DepthEstimator(m, dt, lr=0.2)
        state = est.init(batch)
        repl = parallel.replicated(mesh)
        state = jax.tree.map(
            lambda x: jax.device_put(
                x, shard if getattr(x, "ndim", 0) >= 1 else repl), state)
        state2, loss = est.train_step(state, p, u, p_next)
        assert np.isfinite(float(loss))
        # a second step decreases the loss
        _, loss2 = est.train_step(state2, p, u, p_next)
        assert float(loss2) < float(loss)
