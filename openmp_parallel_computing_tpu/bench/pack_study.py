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
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(batch: int, layout: str, reps: int, frame) -> dict:
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC, solver
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    saved = dict(solver.PACK_SPEED)
    solver.PACK_SPEED = {1: 1.0} if layout == "lane-only" else {8: 1.0}
    try:
        cfg = MPCConfig(horizon=20, num_features=8, scenarios=batch)
        mpc = VisualServoMPC(cfg)
        scen = mpc.random_scenarios(jax.random.PRNGKey(0), batch)
        scen = jax.tree.map(jax.device_put, scen)

        def step(s):
            u0, sol = mpc.control_step(frame, s)
            return u0, s._replace(us0=jnp.roll(sol.us, -1, axis=1))

        u0, s = step(scen)
        np.asarray(u0)                   # compile + sync
        t0 = time.perf_counter()
        for _ in range(reps):
            u0, s = step(s)
        np.asarray(u0)                   # result-dependent fetch
        wall = time.perf_counter() - t0
        assert np.all(np.isfinite(np.asarray(u0)))
        return {"batch": batch, "layout": layout,
                "ms": round(wall / reps * 1e3, 2),
                "solves_per_s": int(batch * reps / wall)}
    finally:
        solver.PACK_SPEED = saved


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1024,2048,4096,8192")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from openmp_parallel_computing_tpu import imgio

    frame_hwc = imgio.load("/root/reference/images/test.jpg")
    frame = jnp.asarray(np.transpose(frame_hwc, (2, 0, 1)))

    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        reps = max(4, min(args.reps, (8192 * args.reps) // max(b, 1) // 4))
        for layout in ("lane-only", "packed"):
            row = measure(b, layout, reps, frame)
            print(json.dumps(row), flush=True)
            rows.append(row)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
