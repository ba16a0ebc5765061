"""Mosaic-lowering smoke tests: every Pallas kernel compiled on the real TPU.

The CPU suite (tests/) runs Pallas in interpret mode; these tests cover the
compiled path by comparing each kernel against its pure-jnp twin ON THE
DEVICE — a lowering regression now fails a test instead of a bench run.
Shapes are kept small so remote compiles stay quick; tolerances match the
CPU suite's contracts (stencils are bit-exact vs their twins, solver
backends agree to ~1e-4 after full ADMM loops in f32; the compiled
Mosaic path additionally reassociates FMA chains, so solver tolerances
here are 5e-4).
"""

import numpy as np
import jax
import jax.numpy as jnp

from openmp_parallel_computing_tpu import ops
from openmp_parallel_computing_tpu.ops import xla_ref
from openmp_parallel_computing_tpu.models.mpc import Scenario, VisualServoMPC
from openmp_parallel_computing_tpu.utils.config import MPCConfig

RNG = np.random.default_rng(7)
RGB = jnp.asarray(RNG.integers(0, 256, (3, 64, 256), dtype=np.uint8))
GRAY = jnp.asarray(RNG.integers(0, 256, (64, 256), dtype=np.uint8))


def fetch(x):
    return np.asarray(x)  # result-dependent fetch == honest sync


class TestStencilLowering:
    def test_grayscale(self):
        got = fetch(ops.grayscale(RGB))
        want = fetch(xla_ref.grayscale(RGB))
        np.testing.assert_array_equal(got, want)

    def test_sobel(self):
        got = fetch(ops.sobel(GRAY))
        want = fetch(xla_ref.sobel(GRAY))
        np.testing.assert_array_equal(got, want)

    def test_edge_pipeline_fused(self):
        got = fetch(ops.edge_pipeline(RGB))
        want = fetch(xla_ref.edge_pipeline(RGB))
        np.testing.assert_array_equal(got, want)

    def test_edge_pyramid_base(self):
        """Fused perception->pooling kernel vs the staged path, on-chip."""
        from openmp_parallel_computing_tpu.models.mpc import costs

        got = fetch(ops.edge_pyramid_base(RGB, s=16))
        edge = fetch(ops.edge_pipeline(RGB))[0].astype(np.float32)
        want = fetch(costs.avg_pool(jnp.asarray(edge), 16))
        np.testing.assert_array_equal(got, want)

    def test_blur(self):
        got = fetch(ops.gaussian_blur(RGB, passes=2))
        want = fetch(xla_ref.conv3x3(xla_ref.conv3x3(RGB)))
        np.testing.assert_array_equal(got, want)

    def test_reductions(self):
        got = fetch(ops.channel_mean(RGB))
        want = fetch(xla_ref.channel_mean(RGB))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        g, mn, mx = ops.grayscale_mean_minmax(RGB)
        gr, mnr, mxr = xla_ref.grayscale_mean_minmax(RGB)
        np.testing.assert_array_equal(fetch(g), fetch(gr))
        assert fetch(mn) == fetch(mnr) and fetch(mx) == fetch(mxr)


class TestSolverLowering:
    """Compiled sweep kernels vs the pure-XLA reference backend on-device."""

    def _solve(self, backend, scen, frame):
        cfg = MPCConfig(horizon=6, num_features=2, ilqr_iters=2,
                        admm_iters=2, backend=backend)
        mpc = VisualServoMPC(cfg)
        u0, sol = mpc.control_step(frame, scen)
        return fetch(u0), fetch(sol.cost)

    def test_sweep_kernels_match_reference(self):
        b, m, h = 128, 2, 6
        scen = Scenario(
            p0=jnp.asarray(RNG.uniform(-.6, .6, (b, 2 * m)), jnp.float32),
            target=jnp.asarray(RNG.uniform(-.5, .5, (b, 2 * m)),
                               jnp.float32),
            depth=jnp.asarray(RNG.uniform(1, 5, (b, m)), jnp.float32),
            us0=jnp.zeros((b, h, 6), jnp.float32))
        u0_sweep, cost_sweep = self._solve("sweep", scen, RGB)
        u0_ref, cost_ref = self._solve("reference", scen, RGB)
        assert np.all(np.isfinite(u0_sweep))
        np.testing.assert_allclose(u0_sweep, u0_ref, rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(cost_sweep, cost_ref, rtol=5e-4,
                                   atol=5e-4)

    def test_fused_riccati_matches_reference(self):
        b, m, h = 128, 2, 6
        scen = Scenario(
            p0=jnp.asarray(RNG.uniform(-.6, .6, (b, 2 * m)), jnp.float32),
            target=jnp.asarray(RNG.uniform(-.5, .5, (b, 2 * m)),
                               jnp.float32),
            depth=jnp.asarray(RNG.uniform(1, 5, (b, m)), jnp.float32),
            us0=jnp.zeros((b, h, 6), jnp.float32))
        u0_fused, cost_fused = self._solve("fused", scen, RGB)
        u0_ref, cost_ref = self._solve("reference", scen, RGB)
        np.testing.assert_allclose(u0_fused, u0_ref, rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(cost_fused, cost_ref, rtol=5e-4,
                                   atol=5e-4)

    def test_multi_sweep_path_matches_reference(self):
        """edge_refresh="admm" routes through the one-launch-per-ADMM
        multi_sweep kernel — compile it on-chip and check against the XLA
        reference under the same schedule."""
        import dataclasses
        b, m, h = 128, 2, 6
        scen = Scenario(
            p0=jnp.asarray(RNG.uniform(-.6, .6, (b, 2 * m)), jnp.float32),
            target=jnp.asarray(RNG.uniform(-.5, .5, (b, 2 * m)),
                               jnp.float32),
            depth=jnp.asarray(RNG.uniform(1, 5, (b, m)), jnp.float32),
            us0=jnp.zeros((b, h, 6), jnp.float32))

        def solve(backend):
            cfg = MPCConfig(horizon=h, num_features=m, ilqr_iters=2,
                            admm_iters=2, backend=backend,
                            edge_refresh="admm")
            mpc = VisualServoMPC(cfg)
            u0, sol = mpc.control_step(RGB, scen)
            return fetch(u0), fetch(sol.cost)

        u0_s, cost_s = solve("sweep")
        u0_r, cost_r = solve("reference")
        assert np.all(np.isfinite(u0_s))
        np.testing.assert_allclose(u0_s, u0_r, rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(cost_s, cost_r, rtol=5e-4, atol=5e-4)

    def test_full_solve_path_matches_reference(self, monkeypatch):
        """The one-launch whole-solve kernel (``sweep_pallas.full_solve``)
        is off by default (``solver._FULL_SOLVE=False`` — measured
        perf-neutral); flip the flag so the compiled Mosaic lowering of
        the kernel itself is covered, and check against the XLA reference
        under the same edge_refresh="solve" schedule."""
        from openmp_parallel_computing_tpu.models.mpc import solver as S
        monkeypatch.setattr(S, "_FULL_SOLVE", True)
        b, m, h = 128, 2, 6
        scen = Scenario(
            p0=jnp.asarray(RNG.uniform(-.6, .6, (b, 2 * m)), jnp.float32),
            target=jnp.asarray(RNG.uniform(-.5, .5, (b, 2 * m)),
                               jnp.float32),
            depth=jnp.asarray(RNG.uniform(1, 5, (b, m)), jnp.float32),
            us0=jnp.zeros((b, h, 6), jnp.float32))

        def solve(backend):
            cfg = MPCConfig(horizon=h, num_features=m, ilqr_iters=2,
                            admm_iters=2, backend=backend,
                            edge_refresh="solve")
            mpc = VisualServoMPC(cfg)
            u0, sol = mpc.control_step(RGB, scen)
            return fetch(u0), fetch(sol.cost)

        u0_s, cost_s = solve("sweep")
        u0_r, cost_r = solve("reference")
        assert np.all(np.isfinite(u0_s))
        np.testing.assert_allclose(u0_s, u0_r, rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(cost_s, cost_r, rtol=5e-4, atol=5e-4)
