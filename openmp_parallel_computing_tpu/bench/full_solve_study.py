"""A/B study: scan-of-``multi_sweep`` launches (+ XLA z/y dual updates)
vs the whole-ADMM one-launch kernel (``MPCConfig.full_solve``), across
the batch-ceiling curve.

The round-3 ceiling probe pinned the residual 1024 -> 16384 falloff on
solver-side XLA glue that GROWS with batch (ADMM z/y updates, warm-start
shift, true-dynamics step: 0.150 -> 0.390 us/solve — docs/DESIGN.md §2g),
but the one-launch kernel that absorbs exactly the z/y part had only been
A/B'd at batch 256, where glue is launch-bound and fusion can't win. This
study runs the honest A/B at the batches where the glue is the measured
limiter. Both arms run identical ``receding_horizon`` windows under
edge_refresh="solve" (the schedule the kernel requires); only
``MPCConfig.full_solve`` differs — a jit-static config field, so the two
arms trace as distinct executables (no jit-cache aliasing, the r2c bug
class).

Usage::

    python -m openmp_parallel_computing_tpu.bench.full_solve_study \
        [--batches 256,1024,4096,16384] [--solves 200000] [--trials 3] \
        [--sampler xla] [--out results/tpu_v5e/...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


def loop_throughput(B: int, steps: int, full: bool, sampler: str,
                    trials: int = 3) -> list[float]:
    import jax
    import numpy as np

    from openmp_parallel_computing_tpu.bench._chain import (
        load_headline_frame)
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    cfg = MPCConfig(scenarios=B, edge_refresh="solve", full_solve=full,
                    edge_sampler=sampler, admm_iters=5,
                    admm_iters_extra=0)  # fixed budget: a pure-path A/B
    mpc = VisualServoMPC(cfg)
    frame = load_headline_frame()
    scen = mpc.random_scenarios(jax.random.PRNGKey(0), B)
    # Warm twice: the first window's outgoing scenario gains the dual
    # warm-start carry (y0 None -> array), retracing the loop.
    for _ in range(2):
        u0s, _, scen = mpc.receding_horizon(frame, scen, steps)
        np.asarray(u0s[-1])                  # warm + honest sync
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        u0s, _, scen = mpc.receding_horizon(frame, scen, steps)
        np.asarray(u0s[-1])
        vals.append(B * steps / (time.perf_counter() - t0))
    assert np.all(np.isfinite(np.asarray(u0s[-1])))
    return vals


def run(batches, solves: int, trials: int, sampler: str) -> list[dict]:
    rows = []
    for B in batches:
        steps = max(8, solves // B)
        row = {"batch": B, "steps": steps, "sampler": sampler}
        for full in (False, True):
            key = "full" if full else "scan"
            vals = loop_throughput(B, steps, full, sampler, trials)
            row[f"{key}_solves_per_s"] = int(statistics.median(vals))
            row[f"{key}_trials"] = [int(v) for v in vals]
        row["full_over_scan"] = round(
            row["full_solves_per_s"] / row["scan_solves_per_s"], 4)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batches", default="256,1024,4096,16384")
    ap.add_argument("--solves", type=int, default=200_000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sampler", default="xla", choices=("xla", "pallas"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    batches = [int(x) for x in args.batches.split(",") if x]
    rows = run(batches, args.solves, args.trials, args.sampler)
    out = {"methodology": (
        "device-resident receding_horizon windows (fixed frame, "
        "edge_refresh='solve'), median of trials, result-dependent fetch "
        "sync; identical solves, only MPCConfig.full_solve differs"),
        "rows": rows}
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
