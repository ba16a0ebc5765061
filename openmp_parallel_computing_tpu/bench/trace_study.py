"""On-chip jax.profiler study of the production loops.

Captures real device-side traces (the axon relay forwards profiler
events: the TPU pid carries per-op XLA events — verified, not host-only)
of:

- ``receding_horizon`` at the 256-scenario headline config (fixed frame,
  edge_refresh="solve") — the solver-only ceiling loop;
- ``receding_horizon_frames`` at the same config — the perception-honest
  headline loop (per-step fused perception on a ring of frames);
- a large-batch ``receding_horizon`` window (default 16384 scenarios) —
  the batch-ceiling regime whose falloff `ceiling_probe` decomposes.

For each capture the trace JSON is parsed and device leaf-op durations
are grouped by op family (Pallas kernels by name; XLA fusions together),
giving the per-step time split that names the limiter at each batch
size. Artifact: one JSON with per-capture op tables + derived shares.

Usage::

    python -m openmp_parallel_computing_tpu.bench.trace_study \
        [--big-batch 16384] [--out results/tpu_v5e/trace_r3.json]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import tempfile


def _capture(fn, sync, log_dir: str) -> str:
    """Run fn under a profiler trace; return the trace.json.gz path."""
    import jax

    fn()          # warm (compile outside the trace)
    sync()
    jax.profiler.start_trace(log_dir)
    fn()
    sync()
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace written under {log_dir}"
    return paths[-1]


def _device_table(trace_path: str) -> dict:
    """Group device-pid leaf ops by base name; durations in us."""
    with gzip.open(trace_path) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    dev_pids = {e.get("pid") for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    durs = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        n = e.get("name", "")
        # containers wrap the leaf ops; don't double count (bare-numeric
        # names are XLA's anonymous top-level containers)
        if n.startswith(("jit_", "PjitFunction", "while.", "body.",
                         "condition.")) or re.fullmatch(r"\d+", n):
            continue
        base = re.sub(r"\.\d+$", "", n)
        if "fusion" in base:
            base = "xla_fusion(all)"
        elif base in ("copy", "copy_bitcast", "bitcast", "slice",
                      "dynamic_update_slice", "dynamic_slice", "broadcast",
                      "broadcast_in_dim", "reshape", "pad", "transpose",
                      "constant", "iota", "convert", "reduce_sum"):
            base = "xla_data_movement(all)"
        d = float(e.get("dur", 0))
        durs[base] += d
        counts[base] += 1
        total += d
    table = [{"op": n, "total_us": round(d, 1), "count": counts[n],
              "share": round(d / total, 4)}
             for n, d in durs.most_common(12)]
    return {"device_total_us": round(total, 1), "ops": table}


def run_study(big_batch: int, steps_small: int = 50,
              steps_big: int = 12) -> dict:
    import jax
    import numpy as np

    from openmp_parallel_computing_tpu.bench._chain import (
        load_headline_frame)
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    frame = load_headline_frame()
    out = {}

    def one(name, B, steps, frames_mode):
        cfg = MPCConfig(horizon=20, num_features=8, scenarios=B,
                        edge_refresh="solve", q_edge=0.1)
        mpc = VisualServoMPC(cfg)
        scen = mpc.random_scenarios(jax.random.PRNGKey(0), B)
        state = {"scen": scen}

        if frames_mode:
            # DISTINCT frames, same construction as the headline bench —
            # identical copies would leave the per-step-perception claim
            # hostage to a future XLA value-CSE of identical slices.
            import jax.numpy as jnp
            shift = frame.shape[-1] // 4
            frames = jnp.stack([jnp.roll(frame, k * shift, axis=-1)
                                for k in range(4)])

            def go():
                u0s, _, state["scen"] = mpc.receding_horizon_frames(
                    frames, state["scen"], steps)
                state["u0s"] = u0s
        else:
            def go():
                u0s, _, state["scen"] = mpc.receding_horizon(
                    frame, state["scen"], steps)
                state["u0s"] = u0s

        with tempfile.TemporaryDirectory() as td:
            path = _capture(go, lambda: np.asarray(state["u0s"][-1]), td)
            tbl = _device_table(path)
        tbl.update(batch=B, steps=steps,
                   us_per_step=round(tbl["device_total_us"] / steps, 1),
                   device_solves_per_s=int(
                       B * steps / (tbl["device_total_us"] * 1e-6)))
        out[name] = tbl
        print(json.dumps({name: tbl}), flush=True)

    one("headline_fixed_frame_256", 256, steps_small, False)
    one("headline_frames_256", 256, steps_small, True)
    one(f"big_batch_{big_batch}", big_batch, steps_big, False)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big-batch", type=int, default=16384)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = {"methodology": (
        "jax.profiler traces through the relay; device-pid leaf ops "
        "grouped by family (containers excluded); one traced window per "
        "capture, compile excluded by a warm pass"), **run_study(args.big_batch)}
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
