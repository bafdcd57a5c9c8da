"""Pallas forest-descent kernel: level-major reorder + interpret-mode parity."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rovinasemanticsegmentation_tpu.models.forest import (
    ForestPredictor,
    TreeArrays,
    build_forest,
    random_forest,
)
from rovinasemanticsegmentation_tpu.ops.forest_pallas import (
    LANES,
    PallasForestPredictor,
    build_level_major,
)


class TestLevelMajor:
    def test_reorder_preserves_semantics(self):
        rng = np.random.default_rng(0)
        forest = random_forest(rng, 3, 7, 20, [4, 5], max_nodes=127)
        lm = build_level_major(forest)
        # Offsets are in 128-chunk units and monotonically increasing.
        assert (np.diff(lm.level_offsets[:, : lm.num_levels], axis=1) >= 0).all()
        assert lm.meta.shape == lm.thresholds.shape
        # Walk the level-major tree by hand and compare with the original.
        x = rng.normal(size=(50, 20)).astype(np.float32)
        ref_leaves = np.asarray(ForestPredictor(forest).leaves(jnp.asarray(x)))
        fb = lm.feat_bits
        for t in range(forest.num_trees):
            meta, thr = lm.meta[t], lm.thresholds[t]
            for p in range(50):
                node = 0
                while (meta[node] >> fb) != 0:
                    f = meta[node] & ((1 << fb) - 1)
                    node = (meta[node] >> fb) + (0 if x[p, f] < thr[node] else 1)
                # Same leaf histogram as the original numbering.
                orig_leaf = ref_leaves[p, t]
                np.testing.assert_allclose(
                    lm.leaf_hist[t, node],
                    forest.leaf_hist[t, orig_leaf],
                    rtol=1e-6,
                )

    def test_single_node_tree(self):
        tree = TreeArrays(
            split_feature=np.zeros(1, np.int32),
            threshold=np.zeros(1, np.float32),
            left_child=np.zeros(1, np.int32),
            leaf_hist=np.array([[[1.0, 2.0]]], np.float32),
        )
        forest = build_forest([tree], [2])
        lm = build_level_major(forest)
        assert lm.num_levels == 1
        np.testing.assert_allclose(lm.leaf_hist[0, 0, 0], [1.0, 2.0])


class TestPallasKernel:
    @pytest.mark.parametrize("seed,trees,depth,nodes", [(0, 4, 8, 301), (1, 2, 12, 801)])
    def test_interpret_parity(self, seed, trees, depth, nodes):
        rng = np.random.default_rng(seed)
        forest = random_forest(
            rng, trees, depth, 150, [8, 9], max_nodes=nodes
        )
        x = jnp.asarray(rng.normal(size=(700, 150)).astype(np.float32))
        ref = np.asarray(ForestPredictor(forest).log_posterior(x))
        pal = np.asarray(
            PallasForestPredictor(forest, interpret=True).log_posterior(x)
        )
        np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-6)

    def test_wide_feature_space(self):
        # feat_bits = 11 means only 2 feature ids pack per int32; the
        # kernel's per-word grouping must stay correct.
        rng = np.random.default_rng(5)
        forest = random_forest(rng, 2, 6, 1500, [4], max_nodes=101)
        x = jnp.asarray(rng.normal(size=(300, 1500)).astype(np.float32))
        ref = np.asarray(ForestPredictor(forest).log_posterior(x))
        pal = np.asarray(
            PallasForestPredictor(forest, interpret=True).log_posterior(x)
        )
        np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("seed,trees,depth,nodes,feats", [
        (0, 4, 8, 301, 150),   # 2 words of 2 trees at feat_bits 8
        (1, 2, 12, 801, 150),
        (5, 2, 6, 101, 1500),  # feat_bits 11: ONE tree per 23-bit word
        (7, 5, 7, 201, 366),   # odd tree count -> ragged last group
    ])
    def test_transpose_pack_parity(self, seed, trees, depth, nodes, feats):
        """The MXU-transpose pack design (diag gathers replaced by an exact
        identity-matmul transpose, VERDICT r3 item 3) must produce
        bit-identical leaves to the diag-gather design."""
        from rovinasemanticsegmentation_tpu.ops.forest_pallas import (
            build_level_major,
            find_leaves_pallas,
        )

        rng = np.random.default_rng(seed)
        forest = random_forest(rng, trees, depth, feats, [4], max_nodes=nodes)
        lm = build_level_major(forest)
        x = jnp.asarray(rng.normal(size=(700, feats)).astype(np.float32))
        kw = dict(
            num_levels=lm.num_levels, feat_bits=lm.feat_bits, interpret=True
        )
        meta, thr = jnp.asarray(lm.meta), jnp.asarray(lm.thresholds)
        off = jnp.asarray(lm.level_offsets)
        nch = jnp.asarray(lm.level_chunks)
        base = np.asarray(
            find_leaves_pallas(x, meta, thr, off, nch, transpose_pack=False, **kw)
        )
        alt = np.asarray(
            find_leaves_pallas(x, meta, thr, off, nch, transpose_pack=True, **kw)
        )
        np.testing.assert_array_equal(alt, base)

    def test_threshold_boundary(self):
        # Equality goes right, as in the reference (classifier.cpp:105).
        tree = TreeArrays(
            split_feature=np.array([0, 0, 0], np.int32),
            threshold=np.array([1.0, 0, 0], np.float32),
            left_child=np.array([1, 0, 0], np.int32),
            leaf_hist=np.stack(
                [np.zeros((1, 2)), [[1.0, 0]], [[0, 1.0]]]
            ).astype(np.float32),
        )
        forest = build_forest([tree], [2])
        pp = PallasForestPredictor(forest, interpret=True)
        x = jnp.array([[0.999], [1.0], [1.001]])
        post = np.asarray(pp.log_posterior(x))[:, 0]
        np.testing.assert_allclose(post, [[1, 0], [0, 1], [0, 1]])


class TestPallasPipeline:
    def test_pipeline_pallas_matches_xla(self):
        """Full single-frame slice through the Pallas descent (interpret on
        CPU) vs the XLA path. Uses 366 features so feature indices >= 257
        exercise the one-hot up-conversion exactness."""
        from rovinasemanticsegmentation_tpu.features.extractor import (
            FeatureConfig,
        )
        from rovinasemanticsegmentation_tpu.pipelines.single_frame import (
            SingleFramePipeline,
        )
        from rovinasemanticsegmentation_tpu.utils.calibration import Calibration

        rng = np.random.default_rng(0)
        h, w = 32, 40
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        depth = rng.integers(600, 9000, (h, w)).astype(np.uint16)
        calib = Calibration(
            intrinsic=np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]]),
            rotation=np.eye(3),
            translation=np.zeros(3),
        )
        cfg = FeatureConfig(patch_size=77, patch_size_reduce=11)
        assert cfg.feature_length == 366
        forest = random_forest(
            rng, num_trees=3, depth=9, num_features=366,
            class_counts=[8, 9], max_nodes=601,
        )
        ref = SingleFramePipeline(cfg, forest, stride=2, use_pallas=False)
        pal = SingleFramePipeline(cfg, forest, stride=2, use_pallas=True)
        r_ref = ref.run(rgb, depth, calib)
        r_pal = pal.run(rgb, depth, calib)
        for a, b in zip(r_ref.posteriors, r_pal.posteriors):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        for a, b in zip(r_ref.labels, r_pal.labels):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
