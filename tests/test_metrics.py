"""Metrics registry + /metricz endpoint tests."""

import io
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np

from openmp_parallel_computing_tpu.utils.metrics import Metrics


def test_counters_gauges_spans():
    m = Metrics()
    m.inc("jobs")
    m.inc("jobs", 2)
    m.gauge("depth", 7)
    with m.span("work"):
        pass
    snap = m.snapshot()
    assert snap["counters"]["jobs"] == 3
    assert snap["gauges"]["depth"] == 7
    assert snap["timings"]["work"]["count"] == 1


def test_emit_json_line():
    m = Metrics()
    m.inc("x")
    buf = io.StringIO()
    m.emit(buf)
    line = json.loads(buf.getvalue())
    assert line["counters"]["x"] == 1


def test_metricz_endpoint(tmp_path):
    import requests
    from openmp_parallel_computing_tpu import imgio
    from openmp_parallel_computing_tpu.serve.server import Handler

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 128, 3), dtype=np.uint8)
    p = tmp_path / "in.png"
    imgio.save_png(p, img)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        with open(p, "rb") as f:
            requests.post(f"{url}/grayscale", files={"image": f})
        snap = requests.get(f"{url}/metricz").json()
        assert snap["counters"].get("serve.requests.grayscale", 0) >= 1
        assert snap["timings"]["serve.request_s"]["count"] >= 1
    finally:
        httpd.shutdown()
