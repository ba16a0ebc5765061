"""Algorithm plug-in contract: one register_kernel() call makes a new op
servable through EVERY tier — CLI, HTTP service, queue worker, frontend —
with no framework file edited (the reference needs a new C program + worker
+ compose entry + frontend action per algorithm, event-driven/README.md:
57-105). The registered op here is the legacy channel-mean grayscale
(old/parallel_to_grayscale.c semantics, integer (r+g+b)/3)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmp_parallel_computing_tpu import imgio, ops


def _mean_gray(img, passes):
    """Channel-mean grayscale as a servable kernel: (3,H,W) u8 -> u8.

    Idempotent, so the ``passes`` repeat loop needs no fori_loop here.
    """
    gray, _, _ = ops.grayscale_mean_minmax(img)
    return gray.astype(jnp.uint8)


@pytest.fixture()
def meangray_kernel():
    ops.register_kernel("meangray", _mean_gray)
    yield "meangray"
    ops.unregister_kernel("meangray")


@pytest.fixture(scope="module")
def test_png(tmp_path_factory):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(40, 136, 3), dtype=np.uint8)
    p = tmp_path_factory.mktemp("img") / "plug.png"
    imgio.save_png(p, img)
    return p, img


def _want(img_hwc):
    chw = np.transpose(img_hwc, (2, 0, 1))
    gray, _, _ = ops.grayscale_mean_minmax(chw)
    return np.asarray(gray).astype(np.uint8)


class TestRegistry:
    def test_register_duplicate_raises(self, meangray_kernel):
        with pytest.raises(ValueError):
            ops.register_kernel("meangray", _mean_gray)

    def test_listed(self, meangray_kernel):
        assert "meangray" in ops.kernel_names()

    def test_cli(self, meangray_kernel, test_png, tmp_path):
        from openmp_parallel_computing_tpu.cli import main as cli_main

        path, img = test_png
        out = tmp_path / "out.png"
        rc = cli_main([str(path), str(out), "1", "--kernel", "meangray"])
        assert rc == 0
        got = np.transpose(imgio.load(out), (2, 0, 1))
        np.testing.assert_array_equal(got, _want(img))

    def test_http(self, meangray_kernel, test_png, tmp_path):
        import requests

        from openmp_parallel_computing_tpu.serve.server import Handler

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            path, img = test_png
            with open(path, "rb") as f:
                resp = requests.post(
                    f"http://127.0.0.1:{httpd.server_address[1]}/meangray",
                    files={"image": ("plug.png", f)})
            assert resp.status_code == 200
            out = tmp_path / "h.png"
            out.write_bytes(resp.content)
            got = np.transpose(imgio.load(out), (2, 0, 1))
            np.testing.assert_array_equal(got, _want(img))
        finally:
            httpd.shutdown()

    def test_queue_worker(self, meangray_kernel, test_png, tmp_path):
        from openmp_parallel_computing_tpu.dispatch import (
            DurableQueue, ObjectStore, Worker)
        from openmp_parallel_computing_tpu.utils.config import DispatchConfig

        path, img = test_png
        cfg = DispatchConfig(root=str(tmp_path / "d"))
        store = ObjectStore(cfg.root)
        key = store.put("uploads/xyz_plug.png", path.read_bytes())
        DurableQueue(cfg.root, cfg.queue).publish(
            {"image_key": key, "threads": [1], "repeat": 1,
             "kernel": "meangray"})
        Worker(cfg).run(stop_when_empty=True)

        done = DurableQueue(cfg.root, f"{cfg.queue}_processed")
        msg = done.claim()
        assert msg is not None and msg.body["image_key"] == key
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            f.write(store.get(msg.body["processed_key"]))
            f.flush()
            got = np.transpose(imgio.load(f.name), (2, 0, 1))
        np.testing.assert_array_equal(got, _want(img))

    def test_frontend_select_lists_registered(self, meangray_kernel,
                                              tmp_path):
        from openmp_parallel_computing_tpu.dispatch.frontend import (
            serve as serve_frontend)
        from openmp_parallel_computing_tpu.utils.config import DispatchConfig

        httpd, state = serve_frontend(
            DispatchConfig(root=str(tmp_path / "f")), port=0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            port = httpd.server_address[1]
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
                page = r.read().decode()
            assert "<option>meangray</option>" in page
        finally:
            httpd.shutdown()
            state.shutdown()
