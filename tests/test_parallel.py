"""Mesh / collective / spatial-sharding tests on the virtual 8-device CPU mesh
(the analogue of the reference's compose-on-one-box distributed testing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from openmp_parallel_computing_tpu import ops, parallel
from openmp_parallel_computing_tpu.parallel import collectives


@pytest.fixture(scope="module")
def mesh8():
    return parallel.make_mesh(data=1, model=8)


@pytest.fixture(scope="module")
def mesh4x2():
    return parallel.make_mesh(data=4, model=2)


class TestMesh:
    def test_devices(self):
        assert len(jax.devices()) == 8

    def test_shapes(self, mesh4x2):
        assert mesh4x2.shape == {"data": 4, "model": 2}

    def test_all_remaining(self):
        m = parallel.make_mesh(model=2)
        assert m.shape == {"data": 4, "model": 2}

    def test_too_many(self):
        with pytest.raises(ValueError):
            parallel.make_mesh(data=16, model=2)


class TestCollectives:
    def test_halo_exchange(self, mesh8):
        x = np.arange(8 * 4 * 8, dtype=np.float32).reshape(8 * 4, 8)

        def f(local):
            top, bottom = collectives.halo_exchange_rows(local, "model")
            return jnp.concatenate([top, bottom], axis=0)

        g = jax.shard_map(f, mesh=mesh8, in_specs=P("model", None),
                          out_specs=P("model", None))
        out = np.asarray(g(x)).reshape(8, 2, 8)
        for d in range(8):
            want_top = x[d * 4 - 1] if d > 0 else np.zeros(8)
            want_bot = x[(d + 1) * 4] if d < 7 else np.zeros(8)
            np.testing.assert_array_equal(out[d, 0], want_top)
            np.testing.assert_array_equal(out[d, 1], want_bot)

    def test_psum(self, mesh8):
        def f(x):
            return collectives.psum(jnp.sum(x), "model")

        g = jax.shard_map(f, mesh=mesh8, in_specs=P("model"),
                          out_specs=P())
        x = np.arange(64, dtype=np.float32)
        assert float(g(x)) == x.sum()


class TestSpatialSharding:
    def test_sharded_sobel_matches_single(self, mesh8, rng):
        gray = rng.integers(0, 256, size=(64, 128), dtype=np.uint8)
        got = np.asarray(parallel.sharded_sobel(gray, mesh8))
        want = np.asarray(ops.sobel(gray))
        np.testing.assert_array_equal(got, want)

    def test_sharded_edge_pipeline_matches_single(self, mesh8, rng):
        img = rng.integers(0, 256, size=(3, 64, 128), dtype=np.uint8)
        got = np.asarray(parallel.sharded_edge_pipeline(img, mesh8))
        want = np.asarray(ops.edge_pipeline(img))
        np.testing.assert_array_equal(got, want)

    def test_indivisible_raises(self, mesh8, rng):
        gray = rng.integers(0, 256, size=(60, 128), dtype=np.uint8)
        with pytest.raises(ValueError):
            parallel.sharded_sobel(gray, mesh8)
