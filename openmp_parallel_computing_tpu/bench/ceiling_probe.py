"""Batch-ceiling decomposition: WHERE does per-scenario throughput go as
the batch grows?

Round 2 measured a monotonic ~17% falloff from 1024 to 16384 scenarios
(`batch_ceiling_r2i.json`) and never diagnosed it. This probe separates
the three candidate costs, all with device-resident ``lax.scan`` loops
(one dispatch per window — no relay noise inside a measurement):

- ``full``: the production control step (``receding_horizon``, fixed
  frame — perception amortized; q_edge=0.1, so each solve samples the
  pyramid at H+1 states x B scenarios and re-evaluates the final edge
  cost).
- ``noedge``: the same loop at q_edge=0 — identical sweep kernels and
  ADMM structure, NO pyramid sampling anywhere. full - noedge = the XLA
  sampling glue (`costs.separable_sample` einsums + layout permutes).
- ``kernel``: bare ``multi_sweep`` launches scanned back-to-back in
  lanes layout (5 per solve-equivalent at the shipped 1x5 budget) — the
  Pallas kernels with zero XLA glue.

Per batch size each row reports solves/s and ms/solve for the three
loops plus the derived per-solve glue cost. Flat ``kernel`` + growing
``full - noedge`` pins the falloff on the sampling glue; a sagging
``kernel`` row means the kernels themselves lose efficiency at many
grid tiles.

Usage::

    python -m openmp_parallel_computing_tpu.bench.ceiling_probe \
        [--batches 1024,4096,16384] [--out results/tpu_v5e/...]
"""

from __future__ import annotations

import argparse
import functools
import json
import statistics
import time


def _lanes_inputs(B, h, m, seed=0):
    import jax.numpy as jnp
    import numpy as np

    n = 2 * m
    rng = np.random.default_rng(seed)
    ps = jnp.asarray(rng.normal(size=(h + 1, n, B)) * 0.2, jnp.float32)
    us = jnp.asarray(rng.normal(size=(h, 6, B)) * 0.1, jnp.float32)
    g = jnp.zeros((h + 1, n, B), jnp.float32)
    target = jnp.asarray(rng.normal(size=(n, B)) * 0.2, jnp.float32)
    izd = jnp.asarray(rng.uniform(0.3, 1.0, (m, B)), jnp.float32)
    return ps[0], ps, us, jnp.clip(us, -1, 1), jnp.zeros_like(us), \
        g, target, izd


def kernel_chain(B: int, steps: int, h: int = 20, m: int = 8,
                 trials: int = 3, sweeps: int = 1) -> list[float]:
    """Back-to-back ``multi_sweep`` launches under one lax.scan dispatch;
    returns sweeps/s per trial (5 sweeps = one shipped-budget solve)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openmp_parallel_computing_tpu.models.mpc import sweep_pallas as sp

    p0, ps, us, z, y, g, target, izd = _lanes_inputs(B, h, m)
    kw = dict(m=m, q=1.0, r=0.01, rho=0.1, qe=0.1, dt=1 / 30)

    @functools.partial(jax.jit, static_argnums=1)
    def window(carry, nsteps):
        def body(c, _):
            ps_c, us_c = c
            ps_n, us_n = sp.multi_sweep(p0, ps_c, us_c, z, y, g, target,
                                        izd, sweeps=sweeps, **kw)
            return (ps_n, us_n), None

        return jax.lax.scan(body, carry, None, length=nsteps)[0]

    carry = (ps, us)
    carry = window(carry, steps)
    np.asarray(carry[1][0, 0, :8])      # honest sync
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        carry = window(carry, steps)
        np.asarray(carry[1][0, 0, :8])
        vals.append(B * steps * sweeps / (time.perf_counter() - t0))
    assert np.all(np.isfinite(np.asarray(carry[1][0, 0, :8])))
    return vals


def loop_throughput(B: int, steps: int, q_edge: float,
                    trials: int = 3, horizon: int = 20) -> list[float]:
    """receding_horizon window throughput (solves/s per trial)."""
    import jax
    import numpy as np

    from openmp_parallel_computing_tpu.bench._chain import (
        load_headline_frame)
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    cfg = MPCConfig(horizon=horizon, num_features=8, scenarios=B,
                    edge_refresh="solve", q_edge=q_edge)
    mpc = VisualServoMPC(cfg)
    frame = load_headline_frame()
    scen = mpc.random_scenarios(jax.random.PRNGKey(0), B)
    # Warm twice: the first window's outgoing scenario gains the dual
    # warm-start carry (y0 None -> array), retracing the loop.
    for _ in range(2):
        u0s, _, scen = mpc.receding_horizon(frame, scen, steps)
        np.asarray(u0s[-1])
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        u0s, _, scen = mpc.receding_horizon(frame, scen, steps)
        np.asarray(u0s[-1])
        vals.append(B * steps / (time.perf_counter() - t0))
    assert np.all(np.isfinite(np.asarray(u0s[-1])))
    return vals


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batches", default="1024,4096,16384")
    ap.add_argument("--solves", type=int, default=200_000,
                    help="solves per window (steps = solves/batch)")
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = []
    for B in (int(x) for x in args.batches.split(",")):
        steps = max(8, args.solves // B)
        full = loop_throughput(B, steps, 0.1, args.trials, args.horizon)
        noedge = loop_throughput(B, steps, 0.0, args.trials, args.horizon)
        # 5 multi_sweep(sweeps=1) launches = one shipped-budget solve.
        kern = kernel_chain(B, steps * 5, h=args.horizon,
                            trials=args.trials)
        f, ne = statistics.median(full), statistics.median(noedge)
        k = statistics.median(kern) / 5.0   # sweeps/s -> solve-equiv/s
        row = {
            "batch": B, "steps": steps,
            "full_solves_per_s": int(f),
            "noedge_solves_per_s": int(ne),
            "kernel_solve_equiv_per_s": int(k),
            "ms_per_solve_full": round(1e3 / f * B, 4),
            "ms_per_solve_noedge": round(1e3 / ne * B, 4),
            "ms_per_solve_kernel": round(1e3 / k * B, 4),
            "ms_edge_glue": round(1e3 * B * (1 / f - 1 / ne), 4),
            "trials": {"full": [int(v) for v in full],
                       "noedge": [int(v) for v in noedge],
                       "kernel": [int(v) for v in kern]},
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"methodology": (
        "device-resident lax.scan windows; median of trials; "
        "full = receding_horizon q_edge=0.1 (fixed frame), noedge = same "
        "at q_edge=0, kernel = bare multi_sweep scan (5 sweeps = one "
        "1x5-budget solve); ms_edge_glue = per-solve cost of the XLA "
        "pyramid-sampling glue (full - noedge)"), "rows": rows}
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
