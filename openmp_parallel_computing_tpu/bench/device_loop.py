"""Device-resident receding-horizon loop throughput.

Measures ``VisualServoMPC.receding_horizon`` — ``lax.scan`` over full
closed-loop control steps, ONE dispatch per window — against the
host-dispatched warm-start chain (``bench.mpc_batch``). The delta is the
per-step host round-trip, which on this dev relay is the dominant cost at
small scenario batches (~0.7 ms dispatch vs ~0.4 ms device compute at 256
scenarios; results/tpu_v5e/latency_floor.json).

Unlike the open-loop chain, each scanned step also advances the true
feature state under the applied control (closed loop), so the measured
unit of work is strictly larger.

Usage: python -m openmp_parallel_computing_tpu.bench.device_loop \
           [--batches 256,1024] [--frames 200] [--trials 3] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import time


def measure(batch: int, n_frames: int, frame, trials: int,
            horizon: int = 20, edge_refresh: str = "solve") -> dict:
    import jax
    import numpy as np

    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    cfg = MPCConfig(horizon=horizon, num_features=8, scenarios=batch,
                    edge_refresh=edge_refresh)
    mpc = VisualServoMPC(cfg)
    scen = mpc.random_scenarios(jax.random.PRNGKey(0), batch)
    scen = jax.tree.map(jax.device_put, scen)

    # compile + honest sync (relay: block_until_ready returns early);
    # twice: the first window's outgoing scenario gains the dual
    # warm-start carry (y0 None -> array), retracing the loop.
    for _ in range(2):
        u0s, _, scen = mpc.receding_horizon(frame, scen, n_frames)
        np.asarray(u0s[-1])

    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        u0s, _, scen = mpc.receding_horizon(frame, scen, n_frames)
        np.asarray(u0s[-1])  # result-dependent fetch == completion
        vals.append(batch * n_frames / (time.perf_counter() - t0))
    assert np.all(np.isfinite(np.asarray(u0s[-1])))
    sps = max(vals)
    return {"batch": batch, "frames_per_window": n_frames,
            "ms_per_step": round(batch / sps * 1e3, 3),
            "solves_per_s": int(sps),
            "trials": [int(v) for v in vals],
            "methodology": "closed-loop lax.scan window, one dispatch; "
                           "best of trials"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,1024")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from openmp_parallel_computing_tpu.bench._chain import (
        load_headline_frame)

    frame = load_headline_frame()
    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        row = measure(b, args.frames, frame, args.trials)
        print(json.dumps(row), flush=True)
        rows.append(row)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
