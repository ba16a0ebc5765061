"""Packed vs lane-only layout study for the MPC sweep kernels.

Forces each sublane layout by pinning ``solver.PACK_SPEED`` to a single
entry, then measures solves/s with the pipelined warm-start-chain
methodology (see ``bench.mpc_batch``). The output updates the cost model
behind ``solver._choose_pack`` whenever the kernels change shape — the
measured packed:lane-only speed ratio IS ``PACK_SPEED[8]``.

Usage: python -m openmp_parallel_computing_tpu.bench.pack_study \
           [--batches 1024,4096,8192] [--out results.json]
"""

from __future__ import annotations

import argparse
import json


def measure(batch: int, layout: str, reps: int, frame,
            edge_refresh: str = "admm", trials: int = 1) -> dict:
    from openmp_parallel_computing_tpu.bench._chain import chain_throughput
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC, solver
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    saved = dict(solver.PACK_SPEED)
    # Pinning the table forces the layout. The engine's jit static key
    # hashes the table at call time (solver._static_key), so the two arms
    # genuinely retrace — a config-only key silently reused the first
    # arm's executable for both rows (the r2c "neutral" artifact).
    solver.PACK_SPEED = {1: 1.0} if layout == "lane-only" else {8: 1.0}
    try:
        cfg = MPCConfig(horizon=20, num_features=8, scenarios=batch,
                        edge_refresh=edge_refresh)
        mpc = VisualServoMPC(cfg)
        vals = chain_throughput(mpc, frame, batch, reps, trials=trials)
        sps = max(vals)
        return {"batch": batch, "layout": layout,
                "edge_refresh": edge_refresh,
                "ms": round(batch / sps * 1e3, 2),
                "solves_per_s": int(sps),
                "trials": [int(v) for v in vals]}
    finally:
        solver.PACK_SPEED = saved


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1024,2048,4096,8192")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--edge-refresh", default="admm",
                    choices=("ilqr", "admm", "solve"))
    ap.add_argument("--trials", type=int, default=1,
                    help="chains per arm; max is reported (relay noise)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from openmp_parallel_computing_tpu.bench._chain import (
        load_headline_frame)

    frame = load_headline_frame()

    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        reps = max(4, min(args.reps, (8192 * args.reps) // max(b, 1) // 4))
        for layout in ("lane-only", "packed"):
            row = measure(b, layout, reps, frame,
                          edge_refresh=args.edge_refresh,
                          trials=args.trials)
            print(json.dumps(row), flush=True)
            rows.append(row)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
