"""Shared kernel runner + restart-durability tests (code-review follow-ups)."""

import numpy as np
import pytest

from openmp_parallel_computing_tpu import ops, parallel
from openmp_parallel_computing_tpu.ops.runner import make_runner, pad_rows


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(5).integers(0, 256, (3, 64, 128),
                                             dtype=np.uint8)


class TestRunner:
    @pytest.mark.parametrize("kernel", ["grayscale", "edge", "blur"])
    def test_single_device_matches_ops(self, kernel, img):
        run = make_runner(kernel, passes=2, devices=1)
        want = {
            "grayscale": lambda: ops.grayscale(img, passes=2),
            "edge": lambda: ops.edge_pipeline(img, passes=2),
            "blur": lambda: ops.gaussian_blur(img, passes=2),
        }[kernel]()
        np.testing.assert_array_equal(np.asarray(run(img)),
                                      np.asarray(want))

    @pytest.mark.parametrize("kernel", ["grayscale", "edge", "blur"])
    def test_sharded_matches_single(self, kernel, img):
        """The devices knob must produce identical pixels for EVERY kernel
        (it used to be silently ignored for grayscale/blur)."""
        run1 = make_runner(kernel, passes=1, devices=1)
        run4 = make_runner(kernel, passes=1, devices=4)
        np.testing.assert_array_equal(np.asarray(run4(img)),
                                      np.asarray(run1(img)))

    @pytest.mark.parametrize("kernel", ["grayscale", "edge", "blur"])
    def test_sharded_nondivisible_height(self, kernel, img):
        """threads=N parity when the image height is NOT a device multiple:
        the padded+sharded+cropped result must match threads=1 pixel-exact,
        including the true last image row (border zeroing / multi-pass pad
        contamination). passes=2 exercises the pad-feedback path."""
        crop = img[:, :30]  # 30 rows, not divisible by 4
        padded, orig_h = pad_rows(crop, 4)
        run1 = make_runner(kernel, passes=2, devices=1)
        run4 = make_runner(kernel, passes=2, devices=4, orig_h=orig_h)
        got = np.asarray(run4(padded))[:, :orig_h]
        np.testing.assert_array_equal(got, np.asarray(run1(crop)))

    def test_unknown_kernel_raises(self):
        with pytest.raises(KeyError):
            make_runner("nope")

    def test_pad_rows(self, img):
        padded, h = pad_rows(img[:, :30], 8)
        assert padded.shape[1] == 32 and h == 30


class TestShardedKernels:
    def test_sharded_grayscale(self, img):
        mesh = parallel.make_mesh(data=1, model=8)
        got = np.asarray(parallel.sharded_grayscale(img, mesh))
        np.testing.assert_array_equal(got, np.asarray(ops.grayscale(img)))

    def test_sharded_blur(self, img):
        mesh = parallel.make_mesh(data=1, model=8)
        got = np.asarray(parallel.sharded_gaussian_blur(img, mesh))
        np.testing.assert_array_equal(got,
                                      np.asarray(ops.gaussian_blur(img)))


class TestFrontendRestartDurability:
    def test_status_survives_restart(self, tmp_path):
        """A fresh FrontendState answers status from the store after the
        original process (and its in-memory cache) is gone."""
        from openmp_parallel_computing_tpu import imgio
        from openmp_parallel_computing_tpu.dispatch import (
            DurableQueue, ObjectStore, Worker)
        from openmp_parallel_computing_tpu.dispatch.frontend import (
            FrontendState)
        from openmp_parallel_computing_tpu.utils.config import DispatchConfig

        cfg = DispatchConfig(root=str(tmp_path / "d"))
        store = ObjectStore(cfg.root)
        rng = np.random.default_rng(1)
        png = tmp_path / "in.png"
        imgio.save_png(png, rng.integers(0, 256, (32, 136, 3),
                                         dtype=np.uint8))
        key = store.put("uploads/abc_in.png", png.read_bytes())
        DurableQueue(cfg.root, cfg.queue).publish(
            {"image_key": key, "threads": [1], "repeat": 1,
             "kernel": "grayscale"})
        Worker(cfg).run(stop_when_empty=True)

        # First frontend consumes the live message.
        fe1 = FrontendState(cfg)
        import time
        deadline = time.time() + 10
        while time.time() < deadline:
            if fe1.status(key)["processed"]:
                break
            time.sleep(0.1)
        assert fe1.status(key)["times"]["1"] > 0
        fe1.shutdown()

        # "Restarted" frontend: empty cache, message acked — must still
        # answer from the durable completion record, timings included.
        fe2 = FrontendState(cfg)
        s = fe2.status(key)
        assert s["processed"] and s["times"]["1"] > 0
        fe2.shutdown()
