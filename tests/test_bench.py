"""Benchmark harness tests: CSV/plot contract, integration run with runs=1
(the reference keeps its harness runnable as the de-facto regression test)."""

import csv
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from openmp_parallel_computing_tpu import imgio
from openmp_parallel_computing_tpu.bench.harness import (
    bench_kernel,
    bench_service,
)
from openmp_parallel_computing_tpu.serve.server import Handler


@pytest.fixture(scope="module")
def png(tmp_path_factory):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(48, 160, 3), dtype=np.uint8)
    p = tmp_path_factory.mktemp("b") / "in.png"
    imgio.save_png(p, img)
    return p


def test_kernel_sweep_csv_and_plots(png, tmp_path):
    rows = bench_kernel(png, workers=(1, 2), runs=2, passes=2,
                        kernel="edge", out_dir=tmp_path)
    assert [r.workers for r in rows] == [1, 2]
    assert all(r.avg_real_s > 0 for r in rows)
    with open(tmp_path / "edge_bench.csv") as f:
        header = next(csv.reader(f))
    assert header == ["threads", "avg_real_sec", "std_real_sec",
                      "avg_cpu_pct", "avg_mem_kb"]
    assert (tmp_path / "tempo_vs_thread.png").exists()
    assert (tmp_path / "speedup_vs_thread.png").exists()


def test_grayscale_sweep_single(png, tmp_path):
    rows = bench_kernel(png, workers=(1,), runs=1, passes=3,
                        kernel="grayscale", out_dir=tmp_path)
    assert len(rows) == 1 and rows[0].avg_real_s > 0


def test_service_sweep(png, tmp_path):
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        rows = bench_service(png, url, workers=(1,), runs=2,
                             out_dir=tmp_path)
        assert rows[0]["avg_request_sec"] >= rows[0]["avg_service_sec"] > 0
        with open(tmp_path / "service_bench.csv") as f:
            header = next(csv.reader(f))
        assert header == ["threads", "avg_request_sec", "std_request_sec",
                          "avg_service_sec", "std_service_sec"]
    finally:
        httpd.shutdown()
