"""Benchmark harness (device sweep, CSV + plots contract)."""

from openmp_parallel_computing_tpu.bench.harness import bench_kernel  # noqa: F401

