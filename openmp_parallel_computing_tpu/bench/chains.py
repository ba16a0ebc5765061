"""Multi-trial headline-chain microbench for kernel A/B comparisons.

Runs the same warm-start dependency chain as the repo-root ``bench.py``
(see its docstring for the methodology and the relay-sync rationale) but
repeats it ``--trials`` times in one process and reports every chain's
throughput plus best/median. One number per process hides relay-noise
spread; for an A/B between two kernel variants, compare medians of
back-to-back runs and sanity-check the per-chain spread.

Usage::

    python -m openmp_parallel_computing_tpu.bench.chains \
        [--scenarios 256] [--reps 40] [--trials 6] [--edge-refresh solve]

Prints one JSON line: {"chains": [...], "best": ..., "median": ...}.
"""

from __future__ import annotations

import argparse
import json


def run(scenarios: int = 256, reps: int = 40, trials: int = 6,
        edge_refresh: str = "solve", ilqr: int | None = None,
        admm: int | None = None, relax: float | None = None) -> dict:
    import statistics

    from openmp_parallel_computing_tpu.bench._chain import (
        chain_throughput,
        load_headline_frame,
    )
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    # Iteration budget defaults to the MPCConfig defaults (the headline
    # configuration); the flags pin another arm for budget A/Bs (e.g. the
    # pre-relaxation 3x5 plain-ADMM budget: --ilqr 3 --admm 5 --relax 1.0).
    over = {k: v for k, v in
            (("ilqr_iters", ilqr), ("admm_iters", admm),
             ("admm_relax", relax)) if v is not None}
    cfg = MPCConfig(horizon=20, num_features=8, scenarios=scenarios,
                    edge_refresh=edge_refresh, **over)
    mpc = VisualServoMPC(cfg)
    vals = chain_throughput(mpc, load_headline_frame(), scenarios, reps,
                            trials=trials)
    # statistics.median averages the middle pair on even trial counts —
    # sorted()[len//2] is the upper-middle element, which systematically
    # flatters whichever variant had a luckier upper half in an A/B.
    return {"chains": [round(v) for v in vals],
            "best": round(max(vals)),
            "median": round(statistics.median(vals))}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scenarios", type=int, default=256)
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--edge-refresh", default="solve",
                    choices=("ilqr", "admm", "solve"))
    ap.add_argument("--ilqr", type=int, default=None)
    ap.add_argument("--admm", type=int, default=None)
    ap.add_argument("--relax", type=float, default=None)
    args = ap.parse_args()
    print(json.dumps(run(args.scenarios, args.reps, args.trials,
                         args.edge_refresh, ilqr=args.ilqr, admm=args.admm,
                         relax=args.relax)))


if __name__ == "__main__":
    main()
