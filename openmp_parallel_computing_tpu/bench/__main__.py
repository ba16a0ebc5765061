"""CLI: python -m openmp_parallel_computing_tpu.bench <image> [options]

The bench_and_plot_monolithic.sh contract (``<img> [threads] [runs]
[passes]``) with devices in place of threads.
"""

import argparse

from openmp_parallel_computing_tpu.bench.harness import bench_kernel


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image")
    ap.add_argument("--workers", default="1",
                    help="comma-separated device counts to sweep")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--passes", type=int, default=10)
    ap.add_argument("--kernel", default="grayscale",
                    choices=["grayscale", "edge", "blur"])
    ap.add_argument("--out", default="results")
    args = ap.parse_args()

    workers = [int(w) for w in args.workers.split(",")]
    rows = bench_kernel(args.image, workers=workers, runs=args.runs,
                        passes=args.passes, kernel=args.kernel,
                        out_dir=args.out)
    for r in rows:
        print(f"devices={r.workers} avg={r.avg_real_s:.4f}s "
              f"sigma={r.std_real_s:.4f}s cpu={r.avg_cpu_pct}% "
              f"rss={r.avg_mem_kb}KB")


if __name__ == "__main__":
    main()
