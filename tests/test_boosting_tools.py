"""Boosted forest, eval tools, and dataset IO tests."""

import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rovinasemanticsegmentation_tpu.models.tools import (
    accuracy,
    confusion_matrix,
    tree_correlation,
)
from rovinasemanticsegmentation_tpu.train.boosting import (
    BoostedForestTrainer,
    load_boosted_forest,
    save_boosted_forest,
)
from rovinasemanticsegmentation_tpu.train.forest_trainer import (
    ForestTrainer,
    TrainerConfig,
)
from rovinasemanticsegmentation_tpu.utils.data_io import (
    read_csv_dataset,
    read_libforest_dataset,
    write_csv_dataset,
    write_libforest_dataset,
)


@pytest.fixture(scope="module")
def separable():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(800, 6)).astype(np.float32)
    y = ((x[:, 0] > 0).astype(np.int32) + 2 * (x[:, 2] > 0)).astype(np.int32)
    return x, y


class TestBoosting:
    @pytest.mark.slow  # boosting IO/weight math covered fast by the roundtrip test
    def test_learns_and_beats_single_stump(self, separable):
        x, y = separable
        # Pinned to host growth: this test validates the SAMME reweighting
        # math, and boosted depth-0 stumps are brittle against the rng
        # STREAM (device growth draws feature subsets on device — same
        # distribution, measured over 200 stumps, but a different stream;
        # this seed's device stream happens to boost poorly).
        cfg = TrainerConfig(
            num_trees=12, max_depth=0, min_split_examples=5, seed=3,
            device_growth=False,
        )
        boosted = BoostedForestTrainer(cfg).learn(x, y, class_counts=[4])
        acc = (boosted.classify(jnp.asarray(x)) == y).mean()
        # Depth-0 stumps (one split) can't separate 4 classes; boosting helps.
        single = ForestTrainer(
            TrainerConfig(
                num_trees=1, max_depth=0, min_split_examples=5, seed=3,
                device_growth=False,
            )
        ).learn(x, y, class_counts=[4])
        single_acc = accuracy(single, jnp.asarray(x), y)
        assert acc > single_acc
        assert acc > 0.6

    @pytest.mark.slow  # boosting IO/weight math covered fast by the roundtrip test
    def test_weights_positive_for_good_learners(self, separable):
        x, y = separable
        cfg = TrainerConfig(num_trees=3, max_depth=6, min_split_examples=5, seed=1)
        boosted = BoostedForestTrainer(cfg).learn(x, y, class_counts=[4])
        assert (boosted.weights > 0).all()

    def test_binary_roundtrip(self, separable, tmp_path):
        x, y = separable
        cfg = TrainerConfig(num_trees=3, max_depth=4, min_split_examples=5, seed=2)
        boosted = BoostedForestTrainer(cfg).learn(x, y, class_counts=[4])
        path = str(tmp_path / "boosted.dat")
        save_boosted_forest(path, boosted)
        loaded = load_boosted_forest(path)
        np.testing.assert_allclose(loaded.weights, boosted.weights, rtol=1e-6)
        np.testing.assert_array_equal(
            loaded.classify(jnp.asarray(x)), boosted.classify(jnp.asarray(x))
        )


class TestTools:
    @pytest.mark.slow  # tools covered fast by CLI e2e metric reports (test_cli.py)
    def test_accuracy_and_confusion(self, separable):
        x, y = separable
        forest = ForestTrainer(
            TrainerConfig(num_trees=3, max_depth=8, min_split_examples=5, seed=0)
        ).learn(x, y, class_counts=[4])
        acc = accuracy(forest, jnp.asarray(x), y)
        assert acc > 0.95
        cm = confusion_matrix(forest, jnp.asarray(x), y)
        assert cm.shape == (4, 4)
        np.testing.assert_allclose(cm.sum(axis=1), 1.0, rtol=1e-6)
        assert np.trace(cm) / 4 == pytest.approx(
            acc, abs=0.05
        )  # balanced classes

    @pytest.mark.slow  # tools covered fast by CLI e2e metric reports (test_cli.py)
    def test_tree_correlation(self, separable):
        x, y = separable
        forest = ForestTrainer(
            TrainerConfig(num_trees=4, max_depth=6, min_split_examples=5, seed=0)
        ).learn(x, y, class_counts=[4])
        corr = tree_correlation(forest, jnp.asarray(x))
        assert corr.shape == (4, 4)
        np.testing.assert_allclose(np.diag(corr), 1.0)
        assert (corr >= 0).all() and (corr <= 1).all()
        assert corr[0, 1] == corr[1, 0]


class TestDataIO:
    def test_csv_roundtrip_with_string_labels(self):
        text = "cat,1.0,2.0\ndog,3.0,4.0\ncat,5.0,6.0\n"
        x, y, names = read_csv_dataset(io.StringIO(text))
        assert names == ["cat", "dog"]
        np.testing.assert_array_equal(y, [0, 1, 0])
        np.testing.assert_allclose(x, [[1, 2], [3, 4], [5, 6]])

    def test_csv_class_column_index(self):
        text = "1.0,cat,2.0\n3.0,dog,4.0\n"
        x, y, names = read_csv_dataset(io.StringIO(text), class_column_index=1)
        np.testing.assert_allclose(x, [[1, 2], [3, 4]])
        np.testing.assert_array_equal(y, [0, 1])

    def test_csv_write_read(self):
        x = np.array([[1.5, -2.25], [0.0, 3.75]], np.float32)
        y = np.array([1, 0], np.int32)
        buf = io.StringIO()
        write_csv_dataset(buf, x, y)
        buf.seek(0)
        x2, y2, names = read_csv_dataset(buf)
        np.testing.assert_allclose(x2, x)
        # Integer labels "0"/"1" sort to themselves.
        np.testing.assert_array_equal(y2, y)

    def test_libsvm_roundtrip_and_format(self):
        from rovinasemanticsegmentation_tpu.utils.data_io import (
            read_libsvm_dataset,
            write_libsvm_dataset,
        )

        text = "1 1:0.5 3:2.0\n0 2:-1.5  # trailing comment\n\n2 1:1\n"
        x, y = read_libsvm_dataset(io.StringIO(text))
        np.testing.assert_array_equal(y, [1, 0, 2])
        np.testing.assert_allclose(
            x, [[0.5, 0, 2.0], [0, -1.5, 0], [1, 0, 0]]
        )
        # Fixed width pads/clips.
        x5, _ = read_libsvm_dataset(io.StringIO(text), num_features=5)
        assert x5.shape == (3, 5)

        buf = io.StringIO()
        write_libsvm_dataset(buf, x, y)
        buf.seek(0)
        x2, y2 = read_libsvm_dataset(buf)
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_allclose(x2, x)

    def test_libforest_binary_roundtrip(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(10, 7)).astype(np.float32)
        y = rng.integers(0, 3, 10).astype(np.int32)
        buf = io.BytesIO()
        write_libforest_dataset(buf, x, y)
        buf.seek(0)
        x2, y2 = read_libforest_dataset(buf)
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_allclose(x2, x)
