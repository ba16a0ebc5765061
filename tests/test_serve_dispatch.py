"""Serving + dispatch tier tests: real HTTP on localhost, real queue/store on
tmpfs — the analogue of the reference's docker-compose-on-one-box testing."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from openmp_parallel_computing_tpu import imgio, ops
from openmp_parallel_computing_tpu.dispatch import (
    DurableQueue,
    ObjectStore,
    Worker,
)
from openmp_parallel_computing_tpu.dispatch.frontend import serve as serve_frontend
from openmp_parallel_computing_tpu.serve import run_request
from openmp_parallel_computing_tpu.serve.server import Handler
from openmp_parallel_computing_tpu.utils.config import DispatchConfig, ServeConfig
from http.server import ThreadingHTTPServer


@pytest.fixture(scope="module")
def test_png(tmp_path_factory, rng=None):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 136, 3), dtype=np.uint8)
    p = tmp_path_factory.mktemp("img") / "in.png"
    imgio.save_png(p, img)
    return p, img


@pytest.fixture(scope="module")
def server():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


class TestServe:
    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz") as r:
            body = json.loads(r.read())
        assert body["status"] == "ok" and body["devices"] >= 1

    def test_grayscale_roundtrip(self, server, test_png, tmp_path):
        path, img = test_png
        out = tmp_path / "out.png"
        r = run_request(server, path, out, kernel="grayscale", passes=2)
        assert r["service_s"] > 0 and r["compute_s"] > 0
        got = np.transpose(imgio.load(out), (2, 0, 1))
        want = np.asarray(ops.grayscale(np.transpose(img, (2, 0, 1))))
        np.testing.assert_array_equal(got, want)

    def test_edge_kernel(self, server, test_png, tmp_path):
        path, img = test_png
        out = tmp_path / "edge.png"
        run_request(server, path, out, kernel="edge")
        got = np.transpose(imgio.load(out), (2, 0, 1))
        want = np.asarray(ops.edge_pipeline(np.transpose(img, (2, 0, 1))))
        np.testing.assert_array_equal(got, want)

    def test_unknown_kernel_404(self, server, test_png):
        import requests
        path, _ = test_png
        with open(path, "rb") as f:
            resp = requests.post(f"{server}/nope", files={"image": f})
        assert resp.status_code == 404

    def test_missing_image_400(self, server):
        import requests
        resp = requests.post(f"{server}/grayscale",
                             data={"threads": "1"},
                             files={"other": ("x.bin", b"123")})
        assert resp.status_code == 400


class TestQueue:
    def test_publish_claim_ack(self, tmp_path):
        q = DurableQueue(tmp_path, "jobs")
        q.publish({"a": 1})
        q.publish({"a": 2})
        assert q.depth() == 2
        j1 = q.claim()
        assert j1.body == {"a": 1}  # FIFO
        q.ack(j1)
        j2 = q.claim()
        assert j2.body == {"a": 2}
        q.nack(j2)
        assert q.depth() == 1
        j2b = q.claim()
        assert j2b.body == {"a": 2}  # redelivered

    def test_visibility_timeout_redelivery(self, tmp_path):
        q = DurableQueue(tmp_path, "jobs", visibility_timeout_s=0.2)
        q.publish({"x": 1})
        j = q.claim()
        assert j is not None and q.claim() is None  # invisible while claimed
        time.sleep(0.3)
        j2 = q.claim()  # worker died -> redelivered
        assert j2 is not None and j2.body == {"x": 1}

    def test_callback_exception_nacks(self, tmp_path):
        q = DurableQueue(tmp_path, "jobs")
        q.publish({"x": 1})
        with pytest.raises(RuntimeError):
            q.consume(lambda body: (_ for _ in ()).throw(RuntimeError("boom")),
                      stop_when_empty=True)
        assert q.depth() == 1  # back in the queue

    def test_competing_consumers(self, tmp_path):
        q = DurableQueue(tmp_path, "jobs")
        for i in range(20):
            q.publish({"i": i})
        seen = []
        lock = threading.Lock()

        def consume():
            q2 = DurableQueue(tmp_path, "jobs")
            while (job := q2.claim()) is not None:
                with lock:
                    seen.append(job.body["i"])
                q2.ack(job)

        threads = [threading.Thread(target=consume) for _ in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert sorted(seen) == list(range(20))  # each exactly once


class TestStore:
    def test_put_get_list(self, tmp_path):
        s = ObjectStore(tmp_path)
        s.put("uploads/a.bin", b"hello")
        assert s.get("uploads/a.bin") == b"hello"
        assert s.exists("uploads/a.bin")
        s.put("processed/a.png", b"img")
        assert s.list("uploads/") == ["uploads/a.bin"]
        assert b"".join(s.get_stream("uploads/a.bin", chunk_size=2)) == b"hello"

    def test_key_escape_rejected(self, tmp_path):
        s = ObjectStore(tmp_path)
        with pytest.raises(ValueError):
            s.put("../../etc/evil", b"x")


class TestEndToEndDispatch:
    def test_job_lifecycle(self, tmp_path, test_png):
        """Upload -> queue -> worker -> processed/ -> completion message."""
        path, img = test_png
        cfg = DispatchConfig(root=str(tmp_path / "d"))
        store = ObjectStore(cfg.root)
        jobs = DurableQueue(cfg.root, cfg.queue)
        key = store.put("uploads/abc_in.png", path.read_bytes())
        jobs.publish({"image_key": key, "threads": [1], "repeat": 2,
                      "passes": 1, "kernel": "grayscale"})

        worker = Worker(cfg)
        worker.run(stop_when_empty=True)

        done = DurableQueue(cfg.root, f"{cfg.queue}_processed")
        msg = done.claim()
        assert msg is not None
        body = msg.body
        assert body["image_key"] == key
        assert body["processed_key"] == "processed/abc_in.png"
        assert "1" in body["times"] and body["times"]["1"] > 0
        assert store.exists(body["processed_key"])
        # result correctness through the whole tier
        import io, tempfile
        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            f.write(store.get(body["processed_key"]))
            f.flush()
            got = np.transpose(imgio.load(f.name), (2, 0, 1))
        want = np.asarray(ops.grayscale(np.transpose(img, (2, 0, 1))))
        np.testing.assert_array_equal(got, want)

    def test_frontend_http_flow(self, tmp_path, test_png):
        import requests
        path, _ = test_png
        cfg = DispatchConfig(root=str(tmp_path / "d2"))
        httpd, state = serve_frontend(cfg, port=0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            with open(path, "rb") as f:
                resp = requests.post(
                    f"http://127.0.0.1:{port}/",
                    files={"image": ("in.png", f)},
                    data={"threads": "1", "repeat": "1", "passes": "1",
                          "kernel": "grayscale"})
            assert resp.status_code == 200
            key = json.loads(
                resp.text.split("const key = ")[1].split(";")[0])
            assert key.startswith("uploads/")
            # Original client filename preserved in the object key
            # (reference: uploads/{uuid}_{filename}).
            assert key.endswith("_in.png")

            r = requests.get(f"http://127.0.0.1:{port}/status",
                             params={"key": key})
            assert r.json() == {"processed": False}

            Worker(cfg).run(stop_when_empty=True)
            deadline = time.time() + 10
            while time.time() < deadline:
                s = requests.get(f"http://127.0.0.1:{port}/status",
                                 params={"key": key}).json()
                if s["processed"]:
                    break
                time.sleep(0.2)
            assert s["processed"] and s["times"]["1"] > 0

            rimg = requests.get(
                f"http://127.0.0.1:{port}/image/{s['processed_key']}")
            assert rimg.status_code == 200 and rimg.content[:4] == b"\x89PNG"
            # Reflected-XSS regression: a crafted ?key= must not be able
            # to terminate the <script> block (json.dumps alone leaves
            # '</script>' intact inside the string; frontend._js_str
            # escapes '<').
            evil = "</script><img src=x onerror=alert(1)>"
            page = requests.get(f"http://127.0.0.1:{port}/",
                                params={"key": evil}).text
            assert "</script><img" not in page
            assert "\\u003c/script" in page  # escaped, still valid JSON/JS
        finally:
            httpd.shutdown()
            state.shutdown()
