"""Empirical anchor for the pod-scaling model (round 5).

``bench/pod_model.py`` predicts multi-host efficiency from a traced
payload + stated latency/bandwidth constants, but none of its terms had
any empirical cross-check (round-4 VERDICT weak #5). This module
measures the one term that CAN be measured without a pod: the
**sharding overhead** of the real ``DistributedMPC`` step on the
virtual CPU mesh.

Methodology — isolating overhead from compute: on a virtual mesh all
"devices" share the host's cores, so a naive weak-scaling curve mostly
measures compute serialization, not sharding cost (the committed
``results/virtual_cpu_mesh`` CSV is honestly labeled schema-only for
exactly that reason). Instead, for each device count n we run the SAME
TOTAL WORK two ways:

    t_shard(n):  DistributedMPC step, n-device (data=n) mesh,
                 total batch B = n * b
    t_single:    plain single-device solve at the same total batch B

Compute is identical, so ``overhead(n) = t_shard(n) - t_single(n*b)``
is the partitioning cost alone: shard_map dispatch, XLA's emulated
collectives (memcpy through host memory), layout/resharding glue. The
model's corresponding term is ``t_dcn(n) = n_coll * 2(n-1) * alpha +
2(n-1)/n * bytes/beta`` — the artifact fits (alpha, beta) to the
measured curve and records the residual per n.

What this anchors: the model's FUNCTIONAL FORM. If overhead on the
virtual mesh already grows faster than ``(n-1)``-shaped (e.g. a
per-step resharding of scenario ingest that scales with total batch),
the model is missing a term and a real pod would miss its prediction at
the recorded n — that is the "where it would first disagree" entry. A
real pod run diffs the same two-way measurement with DCN constants.

Usage (CPU, off any TPU timing window)::

    python -m openmp_parallel_computing_tpu.bench.pod_anchor \
        [--devices 1,2,4,8] [--per-dev 32] [--horizon 50] [--reps 3] \
        [--out results/model/pod_anchor_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time


def run(device_counts, per_dev: int, horizon: int, reps: int,
        frame_hw=(1080, 1920)) -> dict:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{max(device_counts)}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from openmp_parallel_computing_tpu import parallel
    from openmp_parallel_computing_tpu.models.mpc import (
        DistributedMPC, Scenario, VisualServoMPC)
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    cfg = MPCConfig(horizon=horizon, num_features=8)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(
        0, 256, size=(3,) + tuple(frame_hw), dtype=np.uint8))
    m = cfg.num_features

    def scen_batch(B):
        return Scenario(
            p0=jnp.asarray(rng.uniform(-.6, .6, (B, 2 * m)), jnp.float32),
            target=jnp.asarray(rng.uniform(-.5, .5, (B, 2 * m)),
                               jnp.float32),
            depth=jnp.asarray(rng.uniform(1., 5., (B, m)), jnp.float32),
            us0=jnp.zeros((B, cfg.horizon, 6), jnp.float32))

    def timed(fn):
        fn()                                     # compile + warm
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        return statistics.median(vals), [round(v, 4) for v in vals]

    mpc = VisualServoMPC(cfg)
    rows = []
    for n in device_counts:
        B = n * per_dev
        scen = scen_batch(B)
        t_single, single_trials = timed(
            lambda: np.asarray(mpc.control_step(frame, scen)[0]))
        mesh = parallel.make_mesh(data=n, model=1,
                                  devices=jax.devices()[:n])
        dmpc = DistributedMPC(cfg, mesh)
        frame_s, scen_s = dmpc._prepare(frame, scen)
        t_shard, shard_trials = timed(
            lambda: np.asarray(dmpc._step(frame_s, scen_s)[0]))
        rows.append({
            "devices": n, "total_batch": B,
            "t_single_s": round(t_single, 4),
            "t_shard_s": round(t_shard, 4),
            "overhead_s": round(t_shard - t_single, 4),
            "single_trials": single_trials, "shard_trials": shard_trials,
        })
        print(json.dumps(rows[-1]), flush=True)

    # Fit the model's t_dcn form to the measured overhead: with the
    # traced payload (8 B/step on the data axis) the bandwidth term is
    # negligible, so overhead ~ n_coll * 2(n-1) * alpha + c0. Least
    # squares on (x = 2(n-1), y = overhead - overhead(1)).
    base = rows[0]["overhead_s"]
    xs = np.asarray([2 * (r["devices"] - 1) for r in rows], np.float64)
    ys = np.asarray([r["overhead_s"] - base for r in rows], np.float64)
    alpha = float((xs @ ys) / (xs @ xs)) if (xs @ xs) > 0 else 0.0
    resid = [round(float(y - alpha * x), 4) for x, y in zip(xs, ys)]
    worst = int(np.argmax(np.abs(np.asarray(resid)))) if rows else 0
    return {
        "methodology": (
            "same TOTAL work two ways per device count on the virtual "
            "CPU mesh: sharded DistributedMPC step (data=n) vs the "
            "single-device solve at the same total batch — compute "
            "cancels, the difference is partitioning overhead (shard_map "
            "dispatch + emulated collectives + resharding glue). NOT an "
            "efficiency measurement (virtual devices share cores)."),
        "pod_shape": {"horizon": horizon, "per_device_batch": per_dev,
                      "frame": f"{frame_hw[0]}x{frame_hw[1]}"},
        "rows": rows,
        "model_fit": {
            "form": "overhead(n) = overhead(1) + alpha_fit * 2(n-1)",
            "alpha_fit_us_per_hop": round(alpha * 1e6, 2),
            "residual_s_per_n": resid,
            "constant_overhead_s": base,
        },
        "first_disagreement_watch": (
            f"largest |residual| at n={rows[worst]['devices']}: if a "
            "real pod's overhead curve bends the same way, the model is "
            "missing a term beyond per-hop latency (candidate: per-step "
            "resharding that scales with total batch). Diff a pod run's "
            "(t_shard - t_single) against rows[] before trusting the "
            "efficiency prediction."),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--per-dev", type=int, default=32)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="results/model/pod_anchor_r5.json")
    args = ap.parse_args()

    out = run([int(x) for x in args.devices.split(",") if x],
              args.per_dev, args.horizon, args.reps)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out["model_fit"], indent=1))


if __name__ == "__main__":
    main()
