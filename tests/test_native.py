"""Native C++ components: build, parity with the Python fallbacks."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rovinasemanticsegmentation_tpu.native import (
    get_lib,
    native_forest_decode,
    native_lattice_build,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


class TestNativeLattice:
    def test_matches_numpy_builder(self):
        from rovinasemanticsegmentation_tpu.models.lattice import (
            build_lattice,
            lattice_filter,
        )

        rng = np.random.default_rng(0)
        feats = rng.normal(size=(200, 6)).astype(np.float32) * 2.0
        lat_native = build_lattice(feats, use_native=True)
        lat_numpy = build_lattice(feats, use_native=False)
        assert lat_native.num_vertices == lat_numpy.num_vertices
        np.testing.assert_allclose(
            lat_native.barycentric, lat_numpy.barycentric, rtol=1e-5, atol=1e-6
        )
        # Filtering results identical up to vertex numbering.
        vals = rng.normal(size=(200, 3)).astype(np.float32)

        def filt(lat):
            return np.asarray(
                lattice_filter(
                    jnp.asarray(vals),
                    jnp.asarray(lat.offsets),
                    jnp.asarray(lat.barycentric),
                    jnp.asarray(lat.blur_n1),
                    jnp.asarray(lat.blur_n2),
                    lat.num_vertices,
                )
            )

        np.testing.assert_allclose(
            filt(lat_native), filt(lat_numpy), rtol=2e-4, atol=2e-4
        )

    def test_direct_api(self):
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(50, 2)).astype(np.float32)
        out = native_lattice_build(feats)
        assert out is not None
        offsets, bary, n1, n2, m = out
        assert offsets.shape == (50, 3)
        assert 0 < m <= 150
        assert (offsets >= 0).all() and (offsets < m).all()
        np.testing.assert_allclose(bary.sum(axis=1), 1.0, atol=1e-4)
        assert n1.shape == (3, m) and (n1 >= 0).all() and (n1 <= m).all()


class TestNativeForestCodec:
    def test_matches_python_reader(self, tmp_path):
        from rovinasemanticsegmentation_tpu.models.forest import (
            ForestPredictor,
            load_forest,
            random_forest,
            save_forest,
        )

        rng = np.random.default_rng(2)
        forest = random_forest(rng, 3, 7, 30, [8, 9])
        path = str(tmp_path / "f.dat")
        save_forest(path, forest)
        f_native = load_forest(path, use_native=True)
        f_python = load_forest(path, use_native=False)
        assert f_native.class_counts == f_python.class_counts
        assert f_native.node_counts == f_python.node_counts
        np.testing.assert_array_equal(f_native.split_feature, f_python.split_feature)
        np.testing.assert_array_equal(f_native.left_child, f_python.left_child)
        np.testing.assert_allclose(f_native.leaf_hist, f_python.leaf_hist)

        x = jnp.asarray(rng.normal(size=(64, 30)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(ForestPredictor(f_native).log_posterior(x)),
            np.asarray(ForestPredictor(f_python).log_posterior(x)),
        )

    def test_malformed_input(self):
        assert native_forest_decode(b"\x00" * 3) is None  # short header
        bad = (123456789).to_bytes(4, "little") + b"\x00" * 100
        assert native_forest_decode(bad) is None  # absurd tree count...
