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
        # Fixed budget (extra=0): lowering-equivalence tests pin the
        # kernel schedule; the adaptive gate's cross-backend contract has
        # its own boundary tests (tests/test_mpc.py::TestAdaptiveBudget),
        # and its extra iterations amplify reassociation-level backend
        # noise past these tight tolerances.
        cfg = MPCConfig(horizon=6, num_features=2, ilqr_iters=2,
                        admm_iters=2, admm_iters_extra=0, backend=backend)
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
                            admm_iters=2, admm_iters_extra=0,
                            backend=backend, edge_refresh="admm")
            mpc = VisualServoMPC(cfg)
            u0, sol = mpc.control_step(RGB, scen)
            return fetch(u0), fetch(sol.cost)

        u0_s, cost_s = solve("sweep")
        u0_r, cost_r = solve("reference")
        assert np.all(np.isfinite(u0_s))
        np.testing.assert_allclose(u0_s, u0_r, rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(cost_s, cost_r, rtol=5e-4, atol=5e-4)

    def test_full_solve_path_matches_reference(self):
        """The one-launch whole-solve kernel (``sweep_pallas.full_solve``)
        is off by default (``MPCConfig.full_solve=False``); enable it via
        the config so the compiled Mosaic lowering of the kernel itself is
        covered, and check against the XLA reference under the same
        edge_refresh="solve" schedule."""
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
                            edge_refresh="solve", admm_iters_extra=0,
                            full_solve=(backend == "sweep"))
            mpc = VisualServoMPC(cfg)
            u0, sol = mpc.control_step(RGB, scen)
            return fetch(u0), fetch(sol.cost)

        u0_s, cost_s = solve("sweep")
        u0_r, cost_r = solve("reference")
        assert np.all(np.isfinite(u0_s))
        np.testing.assert_allclose(u0_s, u0_r, rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(cost_s, cost_r, rtol=5e-4, atol=5e-4)

    def test_receding_horizon_frames_flagship_path(self):
        """The HEADLINE program: ``receding_horizon_frames`` with the sweep
        backend — lanes-resident scan carry, in-scan fused perception from
        a frame ring, lanes-native ``edge_cost_pyramid_xy`` sampling and
        its autodiff — compiled and run ON-CHIP, checked against the XLA
        reference backend under the same schedule. This is the one path a
        Mosaic regression used to reach only via bench.py; interpret mode
        has hidden two real lowering bugs in this repo's history
        (docs/DESIGN.md §2c, §6)."""
        b, m, h = 128, 2, 6
        frames = jnp.asarray(
            RNG.integers(0, 256, (2, 3, 64, 256), dtype=np.uint8))
        scen = Scenario(
            p0=jnp.asarray(RNG.uniform(-.6, .6, (b, 2 * m)), jnp.float32),
            target=jnp.asarray(RNG.uniform(-.5, .5, (b, 2 * m)),
                               jnp.float32),
            depth=jnp.asarray(RNG.uniform(1, 5, (b, m)), jnp.float32),
            us0=jnp.zeros((b, h, 6), jnp.float32))

        def loop(backend, steps):
            cfg = MPCConfig(horizon=h, num_features=m, ilqr_iters=1,
                            admm_iters=2, admm_iters_extra=0,
                            backend=backend,
                            edge_refresh="solve")  # the headline schedule
            mpc = VisualServoMPC(cfg)
            u0s, cost_seq, scen_out = mpc.receding_horizon_frames(
                frames, scen, steps)
            return fetch(u0s), fetch(cost_seq), fetch(scen_out.p0)

        # Compile gate: the full 3-step lanes-resident scan (in-scan frame
        # slice + perception, solve, true-dynamics step, warm-start shift)
        # must lower and produce a finite, acting controller.
        u0s_s, costs_s, _ = loop("sweep", 3)
        assert np.all(np.isfinite(u0s_s)) and np.all(np.isfinite(costs_s))
        assert np.any(u0s_s != 0.0)          # the controller acts
        # Numeric gate: the 1-step loop vs control_step with the SAME
        # sweep backend — identical kernels, so a Mosaic regression in
        # the loop lowering (lanes carry, in-scan perception, dyn step)
        # shows up without the cross-backend reassociation noise that a
        # closed loop amplifies (~3e-3 observed even at one step; the
        # tight cross-backend gates are the single-solve tests above and
        # the CPU suite's loop equivalence, tests/test_mpc.py).
        u0s_s1, costs_s1, _ = loop("sweep", 1)
        cfg = MPCConfig(horizon=h, num_features=m, ilqr_iters=1,
                        admm_iters=2, admm_iters_extra=0,
                        edge_refresh="solve")
        u0_cs, sol_cs = VisualServoMPC(cfg).control_step(frames[0], scen)
        np.testing.assert_allclose(u0s_s1[0], fetch(u0_cs),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(costs_s1[0], fetch(sol_cs.cost),
                                   rtol=1e-4, atol=1e-4)


class TestSamplerLowering:
    """The VMEM-resident pyramid sampler kernel on the real chip vs the
    XLA separable sampler (interpret mode hid two lowering bugs in this
    repo's history — this is the class of kernel it happened to)."""

    def test_vg_matches_xla_on_chip(self):
        """Tolerance note: BOTH samplers run their contractions at the
        MXU's default (single-pass bf16-input) precision on-chip — the
        XLA einsum path measures 1.6e-3 relative vs exact f32, the kernel
        2.1e-3 (measured round 4; precision=HIGHEST reproduces 2e-7 but
        costs 3-6x MXU passes on a FLOP-bound kernel). The two therefore
        agree to the shared bf16 class, not to f32; the EXACT-arithmetic
        equivalence is pinned by the CPU suite (TestPallasSampler)."""
        from openmp_parallel_computing_tpu.models.mpc import (
            costs, sampler_pallas)

        edge = jnp.asarray(RNG.uniform(0, 255, (64, 256)), jnp.float32)
        pyramid = costs.build_cost_pyramid(edge)
        K, m, B = 7, 4, 256
        x = RNG.uniform(-1.4, 1.4, (K, m, B)).astype(np.float32)
        y = RNG.uniform(-1.4, 1.4, (K, m, B)).astype(np.float32)
        x[0, 0] = -1.0                       # exact border
        x[:, 1] = np.round(x[:, 1], 0)       # exact-integer coords (kinks)
        x, y = jnp.asarray(x), jnp.asarray(y)

        v, gx, gy = sampler_pallas.edge_vg_lanes(
            pyramid, x, y, 64, 256, costs.PYRAMID_SCALES)
        v_want = costs.edge_cost_pyramid_xy(pyramid, x, y, 64, 256)
        m_ = m
        g_want = jax.grad(lambda q: jnp.sum(costs.edge_cost_pyramid_xy(
            pyramid, q[:, :m_], q[:, m_:], 64, 256)))(
                jnp.concatenate([x, y], axis=1))
        np.testing.assert_allclose(fetch(v), fetch(v_want),
                                   rtol=5e-3, atol=1e-4)
        # Gradients: abs tolerance dominated by bf16 noise on the
        # ~255-scale t1/t2 contractions (6e-4 observed on ~0.03 grads).
        np.testing.assert_allclose(fetch(gx), fetch(g_want[:, :m]),
                                   rtol=5e-3, atol=1e-3)
        np.testing.assert_allclose(fetch(gy), fetch(g_want[:, m:]),
                                   rtol=5e-3, atol=1e-3)

    def test_solver_pallas_sampler_on_chip(self):
        """Full sweep solve with edge_sampler="pallas" vs "xla" on-chip."""
        b, m, h = 128, 2, 6
        scen = Scenario(
            p0=jnp.asarray(RNG.uniform(-.6, .6, (b, 2 * m)), jnp.float32),
            target=jnp.asarray(RNG.uniform(-.5, .5, (b, 2 * m)),
                               jnp.float32),
            depth=jnp.asarray(RNG.uniform(1, 5, (b, m)), jnp.float32),
            us0=jnp.zeros((b, h, 6), jnp.float32))

        def solve(sampler):
            cfg = MPCConfig(horizon=h, num_features=m, ilqr_iters=1,
                            admm_iters=2, admm_iters_extra=0,
                            edge_refresh="solve", edge_sampler=sampler)
            mpc = VisualServoMPC(cfg)
            u0, sol = mpc.control_step(RGB, scen)
            return fetch(u0), fetch(sol.cost)

        u0_p, cost_p = solve("pallas")
        u0_x, cost_x = solve("xla")
        assert np.all(np.isfinite(u0_p))
        np.testing.assert_allclose(u0_p, u0_x, rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(cost_p, cost_x, rtol=5e-4, atol=5e-4)
