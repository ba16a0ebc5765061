"""Headline benchmark: MPC solves/s/chip at H=20 on 1080p Sobel features.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the BASELINE.json north-star target of
1,000 solves/s/chip (the reference repo publishes no MPC numbers — its CSVs
cover the CPU stencil harness, reproduced separately by ``-m ...bench``).

The measured unit of work is one full per-frame control path: fused Pallas
grayscale->Sobel on the 1080p frame, edge cost pyramid, and a batch of
complete ADMM+iLQR MPC solves (H=20, 8 features, box-constrained), all in
one jitted device computation. solves/s = scenarios * reps / wall.

Throughput methodology: reps form a warm-start dependency chain (each rep's
``us0`` is the previous rep's shifted control plan — the receding-horizon
pattern), so the device executes them strictly in order and the final fetch
proves the whole chain ran. Issuing the chain without a host sync per rep
measures sustained device throughput; the per-call synced latency is NOT
the framework's cost on this dev runtime — a trivial ``jit(x+1)`` call
costs the same ~30 ms through the TPU relay (results/tpu_v5e/README.md),
so syncing every rep would benchmark the relay, not the solver.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SCENARIOS = 256
REPS = 40


def main() -> None:
    from openmp_parallel_computing_tpu import imgio
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    # edge_refresh="solve": one edge linearization per solve, sampled at
    # the warm-start trajectory — the receding-horizon real-time mode this
    # loop models (staleness bounded by the per-frame warm-start distance;
    # final-cost parity measured in results/tpu_v5e/edge_refresh_study.json).
    # The MPCConfig default stays "admm" because cold-start solves have no
    # staleness bound (docs/DESIGN.md §2d).
    # Iteration budget + over-relaxation: the MPCConfig defaults (1 iLQR
    # sweep x 5 ADMM iterations at admm_relax=1.3) — quality-equivalent to
    # the plain-ADMM 3x5 budget at a third of the sweeps
    # (results/cpu/relax_study_*.json, docs/DESIGN.md §2f).
    cfg = MPCConfig(horizon=20, num_features=8, scenarios=SCENARIOS,
                    edge_refresh="solve")
    mpc = VisualServoMPC(cfg)

    frame_hwc = imgio.load("/root/reference/images/test.jpg")
    frame = jnp.asarray(np.transpose(frame_hwc, (2, 0, 1)))

    scen = mpc.random_scenarios(jax.random.PRNGKey(0), SCENARIOS)
    scen = jax.tree.map(jax.device_put, scen)

    def step(s):
        u0, sol = mpc.control_step(frame, s)
        # warm-start the next frame from the shifted plan (receding horizon)
        return u0, s._replace(us0=jnp.roll(sol.us, -1, axis=1))

    # Warm up (compile), then measure the issued chain. On relayed/async
    # device backends ``block_until_ready`` can return before execution
    # finishes, so the sync point fetches bytes of the final result — which
    # depends on every rep before it through the warm-start chain.
    u0, scen_w = step(scen)
    np.asarray(u0)

    t0 = time.perf_counter()
    s = scen_w
    for _ in range(REPS):
        u0, s = step(s)
    np.asarray(u0)
    wall = time.perf_counter() - t0

    assert np.all(np.isfinite(np.asarray(u0)))
    solves_per_s = SCENARIOS * REPS / wall
    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip_h20_1080p",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
