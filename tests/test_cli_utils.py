"""CLI driver, checkpoint, vision-batch, and config tests."""

import numpy as np
import pytest

from openmp_parallel_computing_tpu import imgio, ops
from openmp_parallel_computing_tpu.cli import main as cli_main
from openmp_parallel_computing_tpu.models.vision import EdgeBatchRunner
from openmp_parallel_computing_tpu.utils import checkpoint
from openmp_parallel_computing_tpu.utils.config import load as load_config


@pytest.fixture()
def png(tmp_path):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(40, 136, 3), dtype=np.uint8)
    p = tmp_path / "in.png"
    imgio.save_png(p, img)
    return p, img


class TestCLI:
    def test_grayscale_contract(self, png, tmp_path, capsys):
        src, img = png
        out = tmp_path / "out.png"
        rc = cli_main([str(src), str(out), "2"])
        assert rc == 0
        printed = capsys.readouterr().out
        assert "Compute kernel ×2:" in printed and " s" in printed
        got = np.transpose(imgio.load(out), (2, 0, 1))
        want = np.asarray(ops.grayscale(np.transpose(img, (2, 0, 1))))
        np.testing.assert_array_equal(got, want)

    def test_edge_kernel(self, png, tmp_path, capsys):
        src, img = png
        out = tmp_path / "edge.png"
        assert cli_main([str(src), str(out), "--kernel", "edge"]) == 0
        assert "grayscale + sobel" in capsys.readouterr().out
        got = np.transpose(imgio.load(out), (2, 0, 1))
        want = np.asarray(ops.edge_pipeline(np.transpose(img, (2, 0, 1))))
        np.testing.assert_array_equal(got, want)

    def test_missing_input_errors(self, tmp_path, capsys):
        rc = cli_main([str(tmp_path / "nope.png"), str(tmp_path / "o.png")])
        assert rc == 1
        assert "error loading" in capsys.readouterr().err


class TestCheckpoint:
    def test_roundtrip_pytree(self, tmp_path):
        state = {
            "us": np.arange(12.0).reshape(2, 6),
            "meta": {"iter": np.int64(7)},
            "seq": [np.ones(3), np.zeros(2)],
            "pair": (np.float32(1.5), np.array([2, 3])),
        }
        p = tmp_path / "ckpt_000.npz"
        checkpoint.save(p, state)
        back = checkpoint.restore(p)
        np.testing.assert_array_equal(back["us"], state["us"])
        assert back["meta"]["iter"] == 7
        np.testing.assert_array_equal(back["seq"][1], state["seq"][1])
        assert isinstance(back["pair"], tuple)

    def test_latest(self, tmp_path):
        assert checkpoint.latest(tmp_path) is None
        checkpoint.save(tmp_path / "ckpt_001.npz", {"a": np.ones(1)})
        checkpoint.save(tmp_path / "ckpt_002.npz", {"a": np.ones(1)})
        assert checkpoint.latest(tmp_path).name == "ckpt_002.npz"

    def test_none_subtrees(self, tmp_path):
        """None leaves consume no leaf slot and restore as None (jax.tree
        drops them from flatten; the spec must not count them)."""
        state = {"a": np.ones(2), "b": None, "c": [None, np.zeros(3), None]}
        p = tmp_path / "ckpt_n.npz"
        checkpoint.save(p, state)
        back = checkpoint.restore(p)
        assert back["b"] is None
        assert back["c"][0] is None and back["c"][2] is None
        np.testing.assert_array_equal(back["a"], state["a"])
        np.testing.assert_array_equal(back["c"][1], state["c"][1])

    def test_typed_prng_key(self, tmp_path):
        import jax

        key = jax.random.key(42)
        state = {"rng": key, "none": None, "x": np.ones(1)}
        p = tmp_path / "ckpt_k.npz"
        checkpoint.save(p, state)
        back = checkpoint.restore(p)
        # Restored key reproduces the same random stream.
        np.testing.assert_array_equal(
            np.asarray(jax.random.uniform(back["rng"], (4,))),
            np.asarray(jax.random.uniform(key, (4,))))

    def test_solver_warm_start_resume(self, tmp_path):
        """A restarted controller resumes from checkpointed controls."""
        import jax.numpy as jnp
        from openmp_parallel_computing_tpu.models.mpc import (
            Scenario, VisualServoMPC)
        from openmp_parallel_computing_tpu.utils.config import MPCConfig

        cfg = MPCConfig(horizon=6, num_features=2, ilqr_iters=2,
                        admm_iters=2, q_edge=0.0)
        mpc = VisualServoMPC(cfg)
        import jax
        scen = mpc.random_scenarios(jax.random.PRNGKey(0), 2)
        edge = jnp.full((32, 128), 100.0, jnp.float32)
        sol = mpc.solve_batch(edge, scen)
        checkpoint.save(tmp_path / "ckpt_1.npz", {"us": sol.us})
        back = checkpoint.restore(checkpoint.latest(tmp_path, "ckpt_"))
        warm = Scenario(p0=scen.p0, target=scen.target, depth=scen.depth,
                        us0=jnp.asarray(back["us"]))
        sol2 = mpc.solve_batch(edge, warm)
        assert float(sol2.cost.mean()) <= float(sol.cost.mean()) + 1e-3


class TestVisionBatch:
    def test_batch_matches_single(self):
        rng = np.random.default_rng(11)
        frames = rng.integers(0, 256, size=(4, 3, 40, 136), dtype=np.uint8)
        runner = EdgeBatchRunner()
        got = np.asarray(runner(frames))
        for b in range(4):
            np.testing.assert_array_equal(
                got[b], np.asarray(ops.edge_pipeline(frames[b])))

    def test_sharded_batch(self):
        from openmp_parallel_computing_tpu import parallel
        mesh = parallel.make_mesh(data=8, model=1)
        rng = np.random.default_rng(12)
        frames = rng.integers(0, 256, size=(8, 3, 40, 136), dtype=np.uint8)
        runner = EdgeBatchRunner(mesh=mesh)
        got = np.asarray(runner(frames))
        np.testing.assert_array_equal(
            got[3], np.asarray(ops.edge_pipeline(frames[3])))


class TestConfig:
    def test_env_override(self):
        cfg = load_config(env={"OMPC_MPC_HORIZON": "50",
                               "OMPC_MESH_MODEL": "2",
                               "OMPC_SERVE_PORT": "8081"})
        assert cfg.mpc.horizon == 50
        assert cfg.mesh.model == 2
        assert cfg.serve.port == 8081

    def test_cli_override_wins(self):
        cfg = load_config(env={"OMPC_MPC_HORIZON": "50"},
                          overrides=["--mpc.horizon=30",
                                     "dispatch.queue=sobel"])
        assert cfg.mpc.horizon == 30
        assert cfg.dispatch.queue == "sobel"

    def test_defaults(self):
        cfg = load_config(env={})
        assert cfg.mpc.horizon == 20 and cfg.mesh.data == -1


class TestCodecFallbackParity:
    """The Pillow fallback must return the same pixels as the native codec
    (native/imgio/imgio.cpp normalizes palette -> RGB(A) and strips 16-bit
    channels to the high byte; a fallback that skips those conversions
    feeds different image data to the kernels depending on the install)."""

    def _native_or_skip(self, path):
        import pytest

        from openmp_parallel_computing_tpu import imgio as im

        if im._load_lib() is None:
            pytest.skip("native codec not built")
        return im.load(path)

    def test_palette_png(self, tmp_path):
        from PIL import Image

        from openmp_parallel_computing_tpu import imgio as im

        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        p = tmp_path / "pal.png"
        Image.fromarray(rgb).convert(
            "P", palette=Image.Palette.ADAPTIVE).save(p)
        native = self._native_or_skip(p)
        fallback = im._load_pil(p)
        assert native.shape == fallback.shape == (24, 32, 3)
        np.testing.assert_array_equal(native, fallback)

    def test_16bit_png(self, tmp_path):
        from PIL import Image

        from openmp_parallel_computing_tpu import imgio as im

        rng = np.random.default_rng(4)
        g16 = rng.integers(0, 65536, (16, 20), dtype=np.uint16)
        p = tmp_path / "g16.png"
        Image.fromarray(g16).save(p)
        native = self._native_or_skip(p)
        fallback = im._load_pil(p)
        assert native.shape == fallback.shape
        np.testing.assert_array_equal(native, fallback)
        np.testing.assert_array_equal(fallback[..., 0], (g16 >> 8))
