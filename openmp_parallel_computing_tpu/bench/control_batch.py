"""Latency vs micro-batch size for the batched /control solve.

Measures the device latency of ``control_step_multi`` at each power-of-two
bucket the serving micro-batcher uses (serve.server.ControlBatcher), i.e.
the marginal cost of coalescing B concurrent control requests into one
solve. Writes the CSV artifact SURVEY/VERDICT ask for next to the other
bench artifacts.

Schema: ``batch,avg_solve_s,std_solve_s,per_req_ms,req_per_s``.

Usage: ``python -m openmp_parallel_computing_tpu.bench.control_batch
[--out results/tpu_v5e/control_batch.csv]`` (runs on the default backend:
the real TPU under axon, CPU in tests).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from openmp_parallel_computing_tpu.models.mpc import Scenario, VisualServoMPC
from openmp_parallel_computing_tpu.utils.config import MPCConfig
from openmp_parallel_computing_tpu.utils.timing import sync


def bench_control_batch(buckets=(1, 2, 4, 8, 16), horizon: int = 20,
                        num_features: int = 4, frame_hw=(1080, 1920),
                        runs: int = 5) -> list[dict]:
    """Per-bucket mean/std of the full control_step_multi latency."""
    cfg = MPCConfig(horizon=horizon, num_features=num_features)
    mpc = VisualServoMPC(cfg)
    rng = np.random.default_rng(0)
    rows = []
    for b in buckets:
        frames = jnp.asarray(rng.integers(
            0, 256, (b, 3) + frame_hw, dtype=np.uint8))
        scen = Scenario(
            p0=jnp.asarray(rng.uniform(-.6, .6, (b, 2 * num_features)),
                           jnp.float32),
            target=jnp.asarray(rng.uniform(-.5, .5, (b, 2 * num_features)),
                               jnp.float32),
            depth=jnp.asarray(rng.uniform(1, 5, (b, num_features)),
                              jnp.float32),
            us0=jnp.zeros((b, horizon, 6), jnp.float32))
        u0, _ = mpc.control_step_multi(frames, scen)   # compile
        sync(u0)
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            u0, _ = mpc.control_step_multi(frames, scen)
            sync(u0)
            ts.append(time.perf_counter() - t0)
        avg, std = float(np.mean(ts)), float(np.std(ts))
        rows.append({
            "batch": b,
            "avg_solve_s": avg,
            "std_solve_s": std,
            "per_req_ms": 1e3 * avg / b,
            "req_per_s": b / avg,
        })
        print(f"batch={b:3d}  solve={avg*1e3:8.2f} ms ±{std*1e3:.2f}  "
              f"per-request={1e3*avg/b:7.2f} ms  {b/avg:8.1f} req/s")
    return rows


def write_csv(rows: list[dict], path: str) -> None:
    import csv
    from pathlib import Path

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="CSV output path")
    ap.add_argument("--buckets", default="1,2,4,8,16")
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--features", type=int, default=4)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    rows = bench_control_batch(
        buckets=tuple(int(b) for b in args.buckets.split(",")),
        horizon=args.horizon, num_features=args.features,
        frame_hw=(args.height, args.width), runs=args.runs)
    if args.out:
        write_csv(rows, args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
