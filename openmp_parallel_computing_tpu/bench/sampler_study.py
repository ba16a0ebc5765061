"""A/B study: XLA separable sampler vs the VMEM-resident Pallas sampler
(``MPCConfig.edge_sampler``), across the regimes the round-3 diagnosis
named (docs/DESIGN.md §2g):

- H=20 at 256..16384 scenarios — the batch-ceiling curve whose edge glue
  is launch-bound at small batch and HBM-bound (weight materialization)
  at 16k;
- H=50 at 256..4096 — the pod config whose 4096 batch collapsed 284k ->
  215k solves/s on HBM-bound sampling tensors (BASELINE config 5,
  ``mpc_h50_r3.json``).

Same device-resident ``receding_horizon`` windows as ``ceiling_probe``
(fixed frame; one dispatch per window; median of trials; result-dependent
fetch sync). Prints one JSON row per (horizon, batch) with both samplers'
solves/s and the ratio.

Usage::

    python -m openmp_parallel_computing_tpu.bench.sampler_study \
        [--h20-batches 256,1024,4096,16384] [--h50-batches 256,1024,4096] \
        [--solves 200000] [--trials 3] [--out results/tpu_v5e/...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


def loop_throughput(B: int, steps: int, horizon: int, sampler: str,
                    trials: int = 3) -> list[float]:
    import jax
    import numpy as np

    from openmp_parallel_computing_tpu.bench._chain import (
        load_headline_frame)
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    cfg = MPCConfig(horizon=horizon, num_features=8, scenarios=B,
                    edge_refresh="solve", edge_sampler=sampler)
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


def run(h20_batches, h50_batches, solves: int, trials: int,
        samplers=("xla", "pallas")) -> list[dict]:
    rows = []
    for horizon, batches in ((20, h20_batches), (50, h50_batches)):
        for B in batches:
            steps = max(8, solves // B)
            row = {"horizon": horizon, "batch": B, "steps": steps}
            for sampler in samplers:
                vals = loop_throughput(B, steps, horizon, sampler, trials)
                row[f"{sampler}_solves_per_s"] = int(
                    statistics.median(vals))
                row[f"{sampler}_trials"] = [int(v) for v in vals]
            # First listed sampler is the ratio baseline (not a
            # hard-coded "xla": --samplers analytic,pallas must work).
            base = samplers[0]
            for sampler in samplers[1:]:
                row[f"{sampler}_over_{base}"] = round(
                    row[f"{sampler}_solves_per_s"]
                    / row[f"{base}_solves_per_s"], 4)
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--h20-batches", default="256,1024,4096,16384")
    ap.add_argument("--h50-batches", default="256,1024,4096")
    ap.add_argument("--solves", type=int, default=200_000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--samplers", default="xla,pallas")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    def parse(s):
        return [int(x) for x in s.split(",") if x]

    rows = run(parse(args.h20_batches), parse(args.h50_batches),
               args.solves, args.trials,
               tuple(s for s in args.samplers.split(",") if s))
    out = {"methodology": (
        "device-resident receding_horizon windows (fixed frame, "
        "edge_refresh='solve'), median of trials, result-dependent fetch "
        "sync; identical solves, only MPCConfig.edge_sampler differs"),
        "rows": rows}
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
