"""Visual-servo MPC demo: drive feature points across a real frame.

Runs the receding-horizon runtime for a few camera frames (static scene),
then renders the predicted feature trajectories over the Sobel edge map.

    python examples/visual_servo_demo.py [--frames 8] [--out demo.png]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None,
                    help="input photo (default: the in-package 1080p "
                         "benchmark frame)")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--scenarios", type=int, default=4)
    ap.add_argument("--out", default="results/visual_servo_demo.png")
    args = ap.parse_args()

    import jax.numpy as jnp

    from openmp_parallel_computing_tpu import data, imgio, ops
    from openmp_parallel_computing_tpu.models.mpc import MPCRuntime
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    frame_hwc = imgio.load(args.image or data.frame_path())
    frame = np.transpose(frame_hwc, (2, 0, 1)).copy()
    h, w = frame.shape[1:]

    cfg = MPCConfig(horizon=20, num_features=4, ilqr_iters=3, admm_iters=5)
    rt = MPCRuntime(cfg)
    rng = np.random.default_rng(0)
    n, m = args.scenarios, cfg.num_features
    p0 = rng.uniform(-0.7, 0.7, (n, 2 * m)).astype(np.float32)
    target = rng.uniform(-0.4, 0.4, (n, 2 * m)).astype(np.float32)
    depth = rng.uniform(1.5, 4.0, (n, m)).astype(np.float32)
    rt.reset(p0, target, depth)

    states = [p0]
    t0 = time.perf_counter()
    for _ in range(args.frames):
        u0 = rt.step(frame)
        states.append(np.asarray(rt.scen.p0))
    wall = time.perf_counter() - t0
    print(f"{args.frames} frames x {n} scenarios in {wall:.2f}s "
          f"({1e3 * wall / args.frames:.1f} ms/frame); final |u0| max = "
          f"{np.abs(np.asarray(u0)).max():.3f}")

    # Render: edge map + trajectories + targets.
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    edge = np.asarray(ops.edge_pipeline(frame))[0]
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.imshow(edge, cmap="gray")
    traj = np.stack(states)  # (F+1, n, 2m)
    to_px = lambda v, size: (v + 1.0) * 0.5 * (size - 1)
    colors = plt.cm.tab10(np.linspace(0, 1, n))
    for s in range(n):
        for f_idx in range(m):
            xs = to_px(traj[:, s, 2 * f_idx], w)
            ys = to_px(traj[:, s, 2 * f_idx + 1], h)
            ax.plot(xs, ys, "-o", color=colors[s], markersize=2.5,
                    linewidth=1.0)
            ax.plot(to_px(target[s, 2 * f_idx], w),
                    to_px(target[s, 2 * f_idx + 1], h), "x",
                    color=colors[s], markersize=8)
    ax.set_title("visual-servo MPC: feature trajectories (o) toward "
                 "targets (x) over the Sobel edge map")
    ax.set_axis_off()
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
