"""Falsifiable pod-scaling prediction for the distributed MPC step.

The >=85% multi-host scaling-efficiency target (BASELINE config 5) cannot
be *measured* on this machine (one real chip). What can be measured is
everything the efficiency depends on:

1. **The per-step cross-host payload.** This module traces the REAL
   ``DistributedMPC`` step (pod shape: H=50, 8 features, 1080p row-sharded
   frame) on a virtual (data x model) mesh and inventories every
   collective with ``parallel.introspect.collective_footprint`` — op,
   payload shape, bytes, and the mesh axes it rides. Under the pod mapping
   (POD_RUNBOOK: the model axis inside a host's ICI slice, hosts along the
   data axis over DCN), bytes on the ``model`` axis are ICI traffic and
   bytes whose axes include ``data`` cross DCN.
2. **The per-step device time**, taken from the on-chip H=50 artifact
   (``results/tpu_v5e/mpc_h50_*.json``) — passed in as measured
   solves/s/chip.

The model combines them: a ring all-reduce of ``b`` bytes over ``n``
hosts moves ``2 (n-1)/n * b`` per host plus ``2 (n-1)`` latency hops, so

    t_dcn(n) = n_coll * 2 (n-1) * alpha  +  2 (n-1)/n * bytes_dcn / beta
    eff(n)   = t_comp / (t_comp + t_dcn(n))

with alpha (per-hop DCN latency) and beta (per-host DCN bandwidth) STATED
as assumptions in the artifact — the prediction is checkable the day
multi-host hardware exists: measure eff(n), compare, and if it misses,
one of (payload, t_comp, alpha, beta) is measurably wrong.

Scenario ingest/result fan-in are per-host (no cross-host traffic); the
camera frame is ingested by every host from its own source (host->device,
not DCN). The solve itself is communication-free by construction — the
only DCN traffic is the diagnostics reduction (see
``models/mpc/distributed.py``).

Usage (CPU virtual mesh; run OFF the TPU host-quiet window)::

    python -m openmp_parallel_computing_tpu.bench.pod_model \
        [--data 4 --model 2] [--scenarios 512] [--horizon 50] \
        [--solves-per-s 215000]  # measured on-chip, mpc_h50 artifact
        [--alpha-us 25] [--beta-gbps 12.5] \
        [--hosts 2,4,8,16,32,64] [--out results/model/pod_scaling_model.json]
"""

from __future__ import annotations

import argparse
import json
import os


def trace_footprint(data: int, model: int, scenarios: int, horizon: int):
    """Trace the pod-shape distributed step on a virtual CPU mesh and
    return (footprint summary dict, per-step DCN/ICI byte totals)."""
    # Append to any pre-existing XLA_FLAGS (setdefault would silently
    # drop the device-count request and the mesh build would fail).
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{data * model}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from openmp_parallel_computing_tpu import parallel
    from openmp_parallel_computing_tpu.models.mpc import (
        DistributedMPC, Scenario)
    from openmp_parallel_computing_tpu.parallel import introspect
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    mesh = parallel.make_mesh(data=data, model=model,
                              devices=jax.devices()[:data * model])
    cfg = MPCConfig(horizon=horizon, num_features=8)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(
        rng.integers(0, 256, size=(3, 1080, 1920), dtype=np.uint8))
    m = cfg.num_features
    scen = Scenario(
        p0=jnp.asarray(rng.uniform(-.6, .6, (scenarios, 2 * m)),
                       jnp.float32),
        target=jnp.asarray(rng.uniform(-.5, .5, (scenarios, 2 * m)),
                           jnp.float32),
        depth=jnp.asarray(rng.uniform(1., 5., (scenarios, m)), jnp.float32),
        us0=jnp.zeros((scenarios, cfg.horizon, 6), jnp.float32))

    dmpc = DistributedMPC(cfg, mesh)
    frame_s, scen_s = dmpc._prepare(frame, scen)
    cols = introspect.collective_footprint(dmpc._step, frame_s, scen_s)
    summary = introspect.footprint_summary(cols)

    dcn = sum(c.bytes * c.count for c in cols if "data" in c.axes)
    ici = sum(c.bytes * c.count
              for c in cols if c.axes and "data" not in c.axes)
    n_dcn_coll = sum(1 for c in cols if "data" in c.axes)
    return summary, dcn, ici, n_dcn_coll


def efficiency_model(t_comp_s: float, bytes_dcn: int, n_coll: int,
                     alpha_s: float, beta_Bps: float,
                     hosts: list[int]) -> list[dict]:
    rows = []
    for n in hosts:
        t_lat = n_coll * 2 * (n - 1) * alpha_s
        t_bw = (2 * (n - 1) / n) * bytes_dcn / beta_Bps
        t_dcn = t_lat + t_bw
        eff = t_comp_s / (t_comp_s + t_dcn)
        rows.append({"hosts": n, "t_dcn_us": round(t_dcn * 1e6, 3),
                     "t_latency_us": round(t_lat * 1e6, 3),
                     "t_bandwidth_us": round(t_bw * 1e6, 3),
                     "efficiency": round(eff, 5)})
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data", type=int, default=4)
    ap.add_argument("--model", type=int, default=2)
    ap.add_argument("--scenarios", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=50)
    # Measured on-chip (results/tpu_v5e/mpc_h50 artifacts): per-chip
    # solves/s at the pod config; per-step time = local_batch / rate.
    ap.add_argument("--solves-per-s", type=float, default=215_000.0)
    ap.add_argument("--local-batch", type=int, default=4096,
                    help="scenarios per HOST (v5e-8 slice) per step")
    ap.add_argument("--alpha-us", type=float, default=25.0,
                    help="assumed one-hop DCN latency (us)")
    ap.add_argument("--beta-gbps", type=float, default=12.5,
                    help="assumed per-host DCN bandwidth (GB/s)")
    ap.add_argument("--hosts", default="2,4,8,16,32,64")
    ap.add_argument("--out", default="results/model/pod_scaling_model.json")
    args = ap.parse_args()

    summary, dcn, ici, n_coll = trace_footprint(
        args.data, args.model, args.scenarios, args.horizon)
    t_comp = args.local_batch / args.solves_per_s
    hosts = [int(x) for x in args.hosts.split(",") if x]
    rows = efficiency_model(t_comp, dcn, n_coll, args.alpha_us * 1e-6,
                            args.beta_gbps * 1e9, hosts)

    out = {
        "mapping": ("model axis inside a host's ICI slice; hosts along "
                    "the data axis over DCN (docs/POD_RUNBOOK.md)"),
        "traced_mesh": {"data": args.data, "model": args.model},
        "pod_shape": {"horizon": args.horizon,
                      "scenarios": args.scenarios, "frame": "1080p"},
        "per_step_payload_bytes": {"dcn_cross_host": dcn,
                                   "ici_intra_host": ici},
        "n_dcn_collectives_per_step": n_coll,
        "collectives": summary,
        "measured_inputs": {
            "solves_per_s_per_chip": args.solves_per_s,
            "local_batch_per_host": args.local_batch,
            "t_comp_per_step_s": t_comp,
            "source": "results/tpu_v5e/mpc_h50_*.json (on-chip)"},
        "assumptions": {
            "alpha_dcn_hop_latency_us": args.alpha_us,
            "beta_dcn_bandwidth_GBps": args.beta_gbps,
            "collective_algorithm": "ring all-reduce, 2(n-1) hops",
            "load_balance": "perfect (scenario batch divides evenly)"},
        "prediction": rows,
        "how_to_falsify": (
            "on an n-host pod, run DistributedMPC.solve at this pod shape "
            "with the same per-host batch, measure steps/s vs the 1-host "
            "rate; compare to `prediction`. A miss indicts one of: the "
            "traced payload (re-run this module), the on-chip t_comp "
            "(re-run bench.mpc_batch --horizon 50), or the stated "
            "alpha/beta (measure with a raw psum microbenchmark)."),
    }
    print(json.dumps({"dcn_bytes": dcn, "ici_bytes": ici,
                      "n_dcn_collectives": n_coll,
                      "efficiency": {r["hosts"]: r["efficiency"]
                                     for r in rows}}, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
