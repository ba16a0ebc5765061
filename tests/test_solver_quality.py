"""Solver quality validation: the default iteration budget must land within
tolerance of a high-budget "converged" baseline (the BASELINE.md
'control-sequence parity within tolerance at the same horizon' check), and
the scaling harness must run end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
from openmp_parallel_computing_tpu.utils.config import MPCConfig


@pytest.fixture(scope="module")
def edge_map():
    rng = np.random.default_rng(17)
    return jnp.asarray(rng.uniform(0, 255, (64, 128)), jnp.float32)


def test_default_budget_near_converged(edge_map):
    """The SHIPPED MPCConfig defaults (1 iLQR sweep x 5 ADMM iterations at
    admm_relax=1.3 — the configuration every headline number runs) must
    land within 10% of a converged plain-ADMM baseline (8x15 @ relax 1.0).
    Quality evidence across budgets/relaxes:
    results/cpu/relax_study_solve.json (docs/DESIGN.md §2f)."""
    m, h = 4, 20
    base_kwargs = dict(horizon=h, num_features=m)
    fast = VisualServoMPC(MPCConfig(**base_kwargs))  # shipped defaults
    # r5b defaults: adaptive 1x(2+3@0.1) — a cold solve trips the gate
    # (residual after 2 base iters ~1.6 >> 0.1), so one-shot quality
    # (this test, the pinned golden below) is identical to the old fixed
    # 1x5. Settled-loop quality: results/cpu/adaptive_budget2_h20*.json.
    assert (fast.cfg.ilqr_iters, fast.cfg.admm_iters,
            fast.cfg.admm_iters_extra, fast.cfg.admm_tol,
            fast.cfg.admm_relax) == (1, 2, 3, 0.1, 1.3), \
        "defaults moved: update the budget gate AND the quality studies"
    slow = VisualServoMPC(MPCConfig(**base_kwargs, ilqr_iters=8,
                                    admm_iters=15, admm_relax=1.0))
    scen = fast.random_scenarios(jax.random.PRNGKey(0), 8)
    cost_fast = np.asarray(fast.solve_batch(edge_map, scen).cost)
    cost_slow = np.asarray(slow.solve_batch(edge_map, scen).cost)
    # Converged baseline should not be dramatically better than the
    # real-time budget; 10% mean regression is the acceptance bar.
    rel = (cost_fast - cost_slow) / np.maximum(np.abs(cost_slow), 1e-3)
    assert rel.mean() < 0.10, f"default budget too loose: {rel}"


def test_headline_budget_near_converged(edge_map):
    """Same gate at the HEADLINE configuration (edge_refresh="solve",
    the warm-start receding-horizon schedule bench.py runs)."""
    fast = VisualServoMPC(MPCConfig(horizon=20, num_features=4,
                                    edge_refresh="solve"))
    slow = VisualServoMPC(MPCConfig(horizon=20, num_features=4,
                                    ilqr_iters=8, admm_iters=15,
                                    admm_relax=1.0))
    scen = fast.random_scenarios(jax.random.PRNGKey(3), 8)
    cost_fast = np.asarray(fast.solve_batch(edge_map, scen).cost)
    cost_slow = np.asarray(slow.solve_batch(edge_map, scen).cost)
    rel = (cost_fast - cost_slow) / np.maximum(np.abs(cost_slow), 1e-3)
    assert rel.mean() < 0.10, f"headline budget too loose: {rel}"


def test_pinned_control_sequence_parity():
    """Control-sequence parity against a pinned golden solve at the
    shipped defaults (H=20, 8 features, 1x5 @ relax 1.3, sweep backend) —
    the BASELINE.md 'control-sequence parity within tolerance at the same
    horizon' row, now gated at the configuration the headline ships.
    Regenerate tests/golden/mpc_us_h20_defaults.npz only with an
    intentional solver-semantics change (same script: solve 8 scenarios
    from PRNGKey(123) on the seed-17 uniform edge map)."""
    gold = np.load(
        __import__("pathlib").Path(__file__).parent
        / "golden" / "mpc_us_h20_defaults.npz")
    cfg = MPCConfig()
    mpc = VisualServoMPC(cfg)
    rng = np.random.default_rng(int(gold["edge_seed"]))
    edge = jnp.asarray(rng.uniform(0, 255, (64, 128)), jnp.float32)
    scen = mpc.random_scenarios(
        jax.random.PRNGKey(int(gold["scen_key"])), int(gold["n_scen"]))
    sol = mpc.solve_batch(edge, scen)
    np.testing.assert_allclose(np.asarray(sol.us), gold["us"],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sol.cost), gold["cost"],
                               rtol=1e-3, atol=1e-3)


def test_solutions_beat_zero_and_greedy(edge_map):
    """The optimizer must beat trivial policies on its own objective:
    the zero policy (non-harm) AND a real one-step-greedy controller
    (does the optimizer actually optimize) — the classical IBVS
    proportional law: at each step minimize the ONE-step cost
    ``q_track*||p + dt*L(p)u - target||^2 + r_ctrl*||u||^2`` in closed
    form (regularized least squares on the interaction matrix), projected
    onto the control box. Greedy ignores the horizon coupling and the
    edge term, which is exactly what the MPC is supposed to exploit."""
    from openmp_parallel_computing_tpu.models.mpc import (
        Scenario, costs, dynamics, riccati)
    cfg = MPCConfig(horizon=12, num_features=4, ilqr_iters=3, admm_iters=5)
    mpc = VisualServoMPC(cfg)
    scen = mpc.random_scenarios(jax.random.PRNGKey(1), 4)
    sol = mpc.solve_batch(edge_map, scen)

    pyramid = costs.build_cost_pyramid(edge_map)
    shape = edge_map.shape

    def traj_cost(s, us):
        stage = costs.make_stage_cost(pyramid, shape, s.target, cfg.q_track,
                                      cfg.r_ctrl, cfg.q_edge)
        term = costs.make_terminal_cost(pyramid, shape, s.target,
                                        cfg.q_track, cfg.q_edge)
        ps = dynamics.rollout(s.p0, us, s.depth, cfg.dt)
        return float(riccati.trajectory_cost(stage, term, ps, us))

    def greedy_us(s):
        """One-step-greedy controls over the horizon (closed form)."""
        eye = jnp.eye(6)

        def body(p, _):
            A = cfg.dt * dynamics.interaction_matrix(p, s.depth)
            u = jnp.linalg.solve(
                cfg.q_track * A.T @ A + cfg.r_ctrl * eye,
                cfg.q_track * A.T @ (s.target - p))
            u = jnp.clip(u, -cfg.u_limit, cfg.u_limit)
            return dynamics.step(p, u, s.depth, cfg.dt), u

        _, us = jax.lax.scan(body, s.p0, None, length=cfg.horizon)
        return us

    for i in range(4):
        s = jax.tree.map(lambda a: a[i], scen)
        zero = traj_cost(s, jnp.zeros((cfg.horizon, 6)))
        greedy = traj_cost(s, greedy_us(s))
        ours = traj_cost(s, sol.us[i])
        assert ours <= zero + 1e-4, f"scenario {i}: {ours} vs zero {zero}"
        assert ours <= greedy + 1e-4, \
            f"scenario {i}: {ours} vs greedy {greedy}"
        # Greedy itself must be a real controller (beats doing nothing),
        # otherwise the bar above is vacuous.
        assert greedy < zero, f"scenario {i}: greedy {greedy} >= zero {zero}"


def test_scaling_harness_runs(tmp_path):
    from openmp_parallel_computing_tpu.bench.scaling import measure_scaling

    cfg = MPCConfig(horizon=4, num_features=2, ilqr_iters=1, admm_iters=1)
    rows = measure_scaling(cfg, device_counts=[1, 2], scen_per_device=2,
                           runs=1, frame_shape=(3, 16, 128),
                           out_dir=tmp_path)
    assert len(rows) == 2
    assert rows[0]["efficiency"] == 1.0
    assert (tmp_path / "scaling_efficiency.csv").exists()


def test_reduced_warm_budget_with_dual_carry_matches_shipped(edge_map):
    """The labeled warm-loop option (admm_iters=3 + the decayed dual
    carry — BASELINE.md's 1x3-dual row, ~1.04M solves/s on chip) must
    track the shipped 1x5 budget in closed loop: final cost within 1%
    and primal residual no worse than 1x3 WITHOUT the carry. Quality
    evidence: results/cpu/dual_warm_loop_solve.json (DESIGN.md §2i)."""
    import dataclasses

    from openmp_parallel_computing_tpu.models.mpc import Scenario

    def closed_loop(cfg, frames=25):
        mpc = VisualServoMPC(cfg)
        scen = mpc.random_scenarios(jax.random.PRNGKey(5), 16)
        if cfg.dual_warm_start:
            scen = scen._replace(y0=jnp.zeros_like(scen.us0))
        costs = resid = None
        for _ in range(frames):
            sol = mpc.solve_batch(edge_map, scen)
            costs = float(jnp.mean(sol.cost))
            resid = float(jnp.mean(sol.primal_residual))
            sh = jnp.concatenate(
                [sol.us[:, 1:], jnp.zeros_like(sol.us[:, :1])], axis=1)
            y0 = None
            if cfg.dual_warm_start:
                y0 = cfg.dual_decay * jnp.concatenate(
                    [sol.dual[:, 1:], jnp.zeros_like(sol.dual[:, :1])],
                    axis=1)
            scen = scen._replace(p0=sol.ps[:, 1], us0=sh, y0=y0)
        return costs, resid

    base = MPCConfig(horizon=10, num_features=4, backend="reference",
                     edge_refresh="solve", admm_iters=5,
                     admm_iters_extra=0)   # the r2-r4 fixed 1x5 budget
    cost_15, _ = closed_loop(dataclasses.replace(
        base, dual_warm_start=False))
    cost_13d, res_13d = closed_loop(dataclasses.replace(
        base, admm_iters=3, dual_warm_start=True))
    cost_13c, res_13c = closed_loop(dataclasses.replace(
        base, admm_iters=3, dual_warm_start=False))
    assert cost_13d <= cost_15 * 1.01, (cost_13d, cost_15)
    assert res_13d <= res_13c * 1.05, (res_13d, res_13c)


def test_undamped_dual_carry_divergence_guard():
    """Regression for the r4 negative result
    (results/cpu/dual_warm_loop_h50_gamma1.json): the UNDAMPED dual carry
    (dual_decay=1.0) destabilizes the H=50 closed loop — by frame ~10 its
    closed-loop cost visibly decouples from the cold-dual loop (93.5 vs
    77.3 in the 60-frame study) while the shipped decay 0.5 tracks it.
    This pins (a) the shipped default stays damped and (b) the mechanism
    that forced it is still there — if solver changes ever make gamma=1
    safe, this test failing is the signal to re-measure, not a bug."""
    import dataclasses

    from openmp_parallel_computing_tpu.ops import xla_ref
    from openmp_parallel_computing_tpu import data

    assert MPCConfig().dual_decay == 0.5

    frame = data.load_frame_planar()
    edge = xla_ref.edge_pipeline(frame)[0].astype(jnp.float32)

    def loop_cost(decay, dual=True, frames=15):
        cfg = MPCConfig(horizon=50, num_features=8, q_edge=0.1,
                        edge_refresh="solve", admm_iters=5,
                        admm_iters_extra=0, dual_warm_start=dual,
                        dual_decay=decay)
        mpc = VisualServoMPC(cfg)
        scen = mpc.random_scenarios(jax.random.PRNGKey(0), 32)
        if dual:
            scen = scen._replace(y0=jnp.zeros_like(scen.us0))
        cost = None
        for _ in range(frames):
            sol = mpc.solve_batch(edge, scen)
            cost = float(jnp.mean(sol.cost))
            sh = jnp.concatenate(
                [sol.us[:, 1:], jnp.zeros_like(sol.us[:, :1])], axis=1)
            y0 = None
            if dual:
                y0 = decay * jnp.concatenate(
                    [sol.dual[:, 1:], jnp.zeros_like(sol.dual[:, :1])],
                    axis=1)
            scen = scen._replace(p0=sol.ps[:, 1], us0=sh, y0=y0)
        return cost

    cold = loop_cost(0.0, dual=False)
    damped = loop_cost(0.5)
    undamped = loop_cost(1.0)
    assert damped <= cold * 1.03, (damped, cold)
    assert undamped > cold * 1.10, \
        f"undamped carry no longer diverges ({undamped} vs {cold}) — " \
        f"re-measure before relaxing dual_decay"


def test_long_horizon_budget_ceiling():
    """Regression for the r5b finding (docs/DESIGN.md §2j "budget
    ceiling"): with the DECAYED dual carry at H=50, a LARGER per-solve
    ADMM budget is not automatically safer — 5 effective iterations
    track the cold loop, but 7 effective iterations destabilize it
    (isolated: asymptotic cost 50.17 -> 61.21 over 100 frames; by frame
    15 the gap is already >30%). The mechanism: more inner iterations
    converge the duals harder onto the CURRENT frame's constraint set,
    and at long horizons the shift+decay carry of those sharper duals
    overdrives the next solve. This is why (a) the adaptive budget's
    base+extra must not exceed the validated 5 at long horizons and (b)
    the adaptive_budget_study pins admm_iters_extra=0 on its emulation
    arms (leaving the default gate on silently turned its full-budget
    arm into 7 effective iterations — the bug that exposed this).
    If this test fails because dual7 stopped diverging, re-measure
    before treating bigger budgets as safe."""
    from openmp_parallel_computing_tpu.ops import xla_ref
    from openmp_parallel_computing_tpu import data

    frame = data.load_frame_planar()
    edge = xla_ref.edge_pipeline(frame)[0].astype(jnp.float32)

    def loop_cost(admm, dual=True, frames=15):
        cfg = MPCConfig(horizon=50, num_features=8, q_edge=0.1,
                        edge_refresh="solve", admm_iters=admm,
                        admm_iters_extra=0, dual_warm_start=dual)
        mpc = VisualServoMPC(cfg)
        scen = mpc.random_scenarios(jax.random.PRNGKey(0), 32)
        if dual:
            scen = scen._replace(y0=jnp.zeros_like(scen.us0))
        cost = None
        for _ in range(frames):
            sol = mpc.solve_batch(edge, scen)
            cost = float(jnp.mean(sol.cost))
            sh = jnp.concatenate(
                [sol.us[:, 1:], jnp.zeros_like(sol.us[:, :1])], axis=1)
            y0 = None
            if dual:
                y0 = cfg.dual_decay * jnp.concatenate(
                    [sol.dual[:, 1:], jnp.zeros_like(sol.dual[:, :1])],
                    axis=1)
            scen = scen._replace(p0=sol.ps[:, 1], us0=sh, y0=y0)
        return cost

    cold5 = loop_cost(5, dual=False)     # measured 72.24 at frame 15
    dual7 = loop_cost(7)                 # measured 97.08 at frame 15
    assert dual7 > cold5 * 1.20, \
        f"7-iteration dual carry no longer diverges at H=50 " \
        f"({dual7} vs {cold5}) — re-measure the budget ceiling"
