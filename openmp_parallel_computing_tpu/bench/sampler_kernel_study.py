"""Raw sampler-pass microbench: XLA separable sampler vs the Pallas
VMEM-resident kernel, isolated from the solver.

``sampler_study`` A/Bs the two samplers inside full receding-horizon
windows; this study times ONE value+grad pass over lanes-layout
coordinates (the exact call ``_SweepLanes.edge_grads`` makes) so kernel
changes (tile size, layout) can be iterated without recompiling the
solver. Device-resident ``lax.scan`` chains ``steps`` passes with a
data dependency (coords nudged by the gradient) so the relay cannot
pipeline-hide anything; sync is a result-dependent fetch.

Usage::

    python -m openmp_parallel_computing_tpu.bench.sampler_kernel_study \
        [--points 21x8x4096,51x8x4096,21x8x16384] [--tiles 512,1024] \
        [--steps 50] [--trials 3] [--out results/tpu_v5e/...]

(Pallas tiles ≥2048 exceed the ~16 MB VMEM scope at ~6 KB/point of
weight/derivative/matmul working set — recorded as "vmem-oom" rows.)
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


def _setup(kshape):
    import jax
    import jax.numpy as jnp

    from openmp_parallel_computing_tpu.bench._chain import (
        load_headline_frame)
    from openmp_parallel_computing_tpu.models.mpc import costs

    frame = load_headline_frame()
    pyramid = costs.build_cost_pyramid_from_frame(jnp.asarray(frame))
    shape = frame.shape[1:]
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    x = jax.random.uniform(kx, kshape, minval=-0.8, maxval=0.8)
    y = jax.random.uniform(ky, kshape, minval=-0.8, maxval=0.8)
    return pyramid, shape, x, y


def _time_loop(fn, x, y, steps, trials):
    """fn(x, y) -> (v, gx, gy); scan with a gradient data dependency."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    @functools.partial(jax.jit, static_argnums=2)
    def loop(x0, y0, n):
        def body(c, _):
            x, y = c
            v, gx, gy = fn(x, y)
            return (x + 1e-3 * gx, y + 1e-3 * gy), jnp.sum(v)
        (xf, yf), vs = jax.lax.scan(body, (x0, y0), None, length=n)
        return vs[-1] + jnp.sum(xf[0, 0]) + jnp.sum(yf[0, 0])

    np.asarray(loop(x, y, steps))            # warm + honest sync
    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = loop(x, y, steps)
        np.asarray(out)
        vals.append(time.perf_counter() - t0)
    n_pts = 1
    for d in x.shape:
        n_pts *= int(d)
    return [n_pts * steps / t for t in vals]     # points/s


def run(point_shapes, tiles, steps, trials):
    import jax

    from openmp_parallel_computing_tpu.models.mpc import (
        costs, sampler_pallas)

    rows = []
    for kshape in point_shapes:
        pyramid, shape, x, y = _setup(kshape)
        h_img, w_img = shape

        def xla_vg(xx, yy):
            def val(xv, yv):
                return jax.numpy.sum(costs.edge_cost_pyramid_xy(
                    pyramid, xv, yv, h_img, w_img))
            (v, (gx, gy)) = jax.value_and_grad(
                lambda c: val(*c), argnums=0)((xx, yy))
            # value pass returns the sum only; the per-state values the
            # solver also wants are a second (fused) evaluation — keep
            # the comparison honest by returning the same triple.
            vals = costs.edge_cost_pyramid_xy(pyramid, xx, yy, h_img,
                                              w_img)
            return vals, gx, gy

        def analytic_vg(xx, yy):
            return costs.edge_vg_pyramid_xy(pyramid, xx, yy, h_img, w_img)

        row = {"points": "x".join(map(str, kshape))}
        vals = _time_loop(xla_vg, x, y, steps, trials)
        row["xla_pts_per_s"] = int(statistics.median(vals))
        vals = _time_loop(analytic_vg, x, y, steps, trials)
        row["analytic_pts_per_s"] = int(statistics.median(vals))
        row["analytic_over_xla"] = round(
            row["analytic_pts_per_s"] / row["xla_pts_per_s"], 4)
        for tile in tiles:
            def pl_vg(xx, yy, t=tile):
                return sampler_pallas.edge_vg_lanes(
                    pyramid, xx, yy, h_img, w_img,
                    scales=costs.PYRAMID_SCALES, tile=t)
            try:
                vals = _time_loop(pl_vg, x, y, steps, trials)
            except Exception as e:  # VMEM OOM at large tiles: record, go on
                row[f"pallas_t{tile}_pts_per_s"] = (
                    "vmem-oom" if "vmem" in str(e).lower() else
                    f"error: {str(e)[:120]}")
                continue
            row[f"pallas_t{tile}_pts_per_s"] = int(statistics.median(vals))
        pallas_ok = [v for k, v in row.items()
                     if k.startswith("pallas") and isinstance(v, int)]
        if pallas_ok:
            row["best_pallas_over_xla"] = round(
                max(pallas_ok) / row["xla_pts_per_s"], 4)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--points", default="21x8x4096,51x8x4096,21x8x16384")
    ap.add_argument("--tiles", default="512,2048,4096")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    shapes = [tuple(int(v) for v in s.split("x"))
              for s in args.points.split(",") if s]
    tiles = [int(t) for t in args.tiles.split(",") if t]
    rows = run(shapes, tiles, args.steps, args.trials)
    out = {"methodology": (
        "one value+grad pass per scan step (gradient-fed coordinate "
        "dependency, device-resident), median of trials, result-dependent "
        "fetch sync; XLA = edge_cost_pyramid_xy + autodiff, Pallas = "
        "edge_vg_lanes at each tile size"), "rows": rows}
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
