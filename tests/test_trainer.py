"""Forest trainer tests: split criterion semantics + end-to-end learning."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rovinasemanticsegmentation_tpu.models.forest import ForestPredictor
from rovinasemanticsegmentation_tpu.train.forest_trainer import (
    ForestTrainer,
    TrainerConfig,
    split_search_step,
    _inverted_class_frequency,
)


def oracle_best_split(vals, cls, num_classes):
    """Literal port of the per-node sweep (learning.cpp:551-603)."""
    order = np.argsort(vals, kind="stable")
    v, c = vals[order], cls[order]
    n = len(v)

    def ent(h):
        m = h.sum()
        out = m * np.log2(m) if m > 0 else 0.0
        for x in h:
            if x > 0:
                out -= x * np.log2(x)
        return out

    best = np.inf
    best_thr, best_lm, best_rm = 0.0, 0, 0
    left = np.zeros(num_classes)
    right = np.bincount(c, minlength=num_classes).astype(float)
    left_value, left_class = v[0], c[0]
    for m in range(1, n):
        left[left_class] += 1
        right[left_class] -= 1
        if v[m] - left_value < 1e-6:
            left_value, left_class = v[m], c[m]
            continue
        obj = ent(left) + ent(right)
        if obj < best:
            best = obj
            best_thr = 0.5 * (left_value + v[m])
            best_lm, best_rm = left.sum(), right.sum()
        left_value, left_class = v[m], c[m]
    return best, best_thr, best_lm, best_rm


class TestSplitSearch:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_oracle_single_segment(self, seed):
        rng = np.random.default_rng(seed)
        n, c = 100, 4
        vals = rng.normal(size=n).astype(np.float32)
        cls = rng.integers(0, c, n).astype(np.int32)
        seg = np.zeros(n, np.int32)
        obj, thr, lm, rm = (
            np.asarray(a)
            for a in split_search_step(
                jnp.asarray(vals), jnp.asarray(seg), jnp.asarray(cls),
                jnp.ones(c), 1, c
            )
        )
        want = oracle_best_split(vals, cls, c)
        assert obj[0] == pytest.approx(want[0], rel=1e-5)
        assert thr[0] == pytest.approx(want[1], rel=1e-5)
        assert lm[0] == want[2] and rm[0] == want[3]

    def test_multiple_segments_independent(self):
        rng = np.random.default_rng(3)
        n, c = 60, 3
        vals = rng.normal(size=2 * n).astype(np.float32)
        cls = rng.integers(0, c, 2 * n).astype(np.int32)
        seg = np.repeat([0, 1], n).astype(np.int32)
        obj, thr, lm, rm = (
            np.asarray(a)
            for a in split_search_step(
                jnp.asarray(vals), jnp.asarray(seg), jnp.asarray(cls),
                jnp.ones(c), 2, c
            )
        )
        for s in range(2):
            want = oracle_best_split(vals[s * n:(s + 1) * n], cls[s * n:(s + 1) * n], c)
            assert obj[s] == pytest.approx(want[0], rel=1e-5)
            assert thr[s] == pytest.approx(want[1], rel=1e-5)

    @pytest.mark.parametrize("seed", [0, 5])
    def test_class_frequency_weighting(self, seed):
        """Weighted entropies (learning.cpp:220-256, class priors from
        data.h:346-357) against a literal weighted oracle on an imbalanced
        node; weights must be able to change the chosen split."""
        rng = np.random.default_rng(seed)
        n, c = 120, 3
        vals = rng.normal(size=n).astype(np.float32)
        cls = (rng.random(n) < 0.12).astype(np.int32) * rng.integers(
            1, c, n
        ).astype(np.int32)  # heavy class 0
        counts = np.bincount(cls, minlength=c).astype(np.float32)
        weights = np.where(counts > 0, n / np.maximum(counts, 1), 1.0)

        def ent(h):
            m = h.sum()
            out = m * np.log2(m) if m > 0 else 0.0
            for x in h:
                if x > 0:
                    out -= x * np.log2(x)
            return out

        order = np.argsort(vals, kind="stable")
        v, cl = vals[order], cls[order]
        best, best_thr = np.inf, 0.0
        left = np.zeros(c)
        right = counts.astype(float).copy()
        left_value, left_class = v[0], cl[0]
        for m in range(1, n):
            left[left_class] += 1
            right[left_class] -= 1
            if v[m] - left_value < 1e-6:
                left_value, left_class = v[m], cl[m]
                continue
            obj = ent(left * weights) + ent(right * weights)
            if obj < best:
                best, best_thr = obj, 0.5 * (left_value + v[m])
            left_value, left_class = v[m], cl[m]

        obj_j, thr_j, *_ = (
            np.asarray(a)
            for a in split_search_step(
                jnp.asarray(vals), jnp.zeros(n, jnp.int32), jnp.asarray(cls),
                jnp.asarray(weights), 1, c
            )
        )
        assert obj_j[0] == pytest.approx(best, rel=1e-4)
        assert thr_j[0] == pytest.approx(best_thr, rel=1e-5)

    def test_identical_values_no_split(self):
        vals = np.ones(20, np.float32)
        cls = np.arange(20).astype(np.int32) % 2
        obj, *_ = split_search_step(
            jnp.asarray(vals), jnp.zeros(20, jnp.int32), jnp.asarray(cls),
            jnp.ones(2), 1, 2
        )
        assert np.isinf(np.asarray(obj)[0])

    def test_inactive_segment_ignored(self):
        vals = np.linspace(0, 1, 20).astype(np.float32)
        cls = (vals > 0.5).astype(np.int32)
        seg = np.full(20, 1, np.int32)  # == num_segments -> inactive
        obj, *_ = split_search_step(
            jnp.asarray(vals), jnp.asarray(seg), jnp.asarray(cls),
            jnp.ones(2), 1, 2
        )
        assert np.isinf(np.asarray(obj)[0])


class TestForestTrainer:
    def test_learns_separable_data(self):
        rng = np.random.default_rng(0)
        n = 2000
        x = rng.normal(size=(n, 10)).astype(np.float32)
        y = ((x[:, 3] > 0).astype(np.int32) + 2 * (x[:, 7] > 0.5)).astype(np.int32)
        trainer = ForestTrainer(
            TrainerConfig(num_trees=3, max_depth=10, min_split_examples=5, seed=1)
        )
        forest = trainer.learn(x, y, class_counts=[4])
        pred = ForestPredictor(forest)
        post = np.asarray(pred.log_posterior(jnp.asarray(x)))[:, 0, :4]
        acc = (post.argmax(1) == y).mean()
        assert acc > 0.97

    def test_multi_label_learning(self):
        rng = np.random.default_rng(1)
        n = 1500
        x = rng.normal(size=(n, 8)).astype(np.float32)
        y = np.stack(
            [(x[:, 0] > 0).astype(np.int32),
             (x[:, 1] > 0).astype(np.int32) + (x[:, 2] > 0)],
            axis=1,
        )
        trainer = ForestTrainer(
            TrainerConfig(num_trees=4, max_depth=8, min_split_examples=5, seed=2)
        )
        forest = trainer.learn(x, y, class_counts=[2, 3])
        assert forest.multi_label
        assert forest.num_layers == 2
        pred = ForestPredictor(forest)
        post = np.asarray(pred.log_posterior(jnp.asarray(x)))
        acc0 = (post[:, 0, :2].argmax(1) == y[:, 0]).mean()
        acc1 = (post[:, 1, :3].argmax(1) == y[:, 1]).mean()
        assert acc0 > 0.9 and acc1 > 0.8

    def test_max_depth_respected(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(500, 5)).astype(np.float32)
        y = rng.integers(0, 2, 500).astype(np.int32)
        forest = ForestTrainer(
            TrainerConfig(num_trees=1, max_depth=3, min_split_examples=2, seed=0)
        ).learn(x, y, class_counts=[2])
        assert forest.max_depth <= 4  # children of depth-3 nodes

    def test_min_split_respected(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(100, 3)).astype(np.float32)
        y = rng.integers(0, 2, 100).astype(np.int32)
        # min_split above the dataset size: the root may never split.
        forest = ForestTrainer(
            TrainerConfig(
                num_trees=1, max_depth=30, min_split_examples=101,
                use_bootstrap=False, seed=0,
            )
        ).learn(x, y, class_counts=[2])
        assert forest.node_counts == (1,)
        # min_split = 51: every *split* node must have held >= 51 examples
        # (unbalanced splits may legally chain deep — e.g. 100 -> 99 -> ...).
        forest2 = ForestTrainer(
            TrainerConfig(
                num_trees=1, max_depth=30, min_split_examples=51,
                use_bootstrap=False, seed=0,
            )
        ).learn(x, y, class_counts=[2])
        view = forest2.tree_view(0)
        counts = np.zeros(len(view.split_feature), int)
        for xi in x:
            n = 0
            while view.left_child[n] != 0:
                n = view.left_child[n] + (
                    0 if xi[view.split_feature[n]] < view.threshold[n] else 1
                )
            counts[n] += 1
        mass = counts.copy()
        for n in reversed(range(len(counts))):
            if view.left_child[n] != 0:
                mass[n] = mass[view.left_child[n]] + mass[view.left_child[n] + 1]
        for n in range(len(counts)):
            if view.left_child[n] != 0:
                assert mass[n] >= 51

    def test_pure_node_stops(self):
        x = np.linspace(0, 1, 50).astype(np.float32)[:, None]
        y = np.zeros(50, np.int32)  # single class: pure root, no splits
        forest = ForestTrainer(
            TrainerConfig(num_trees=1, min_split_examples=2, use_bootstrap=False)
        ).learn(x, y, class_counts=[2])
        assert forest.node_counts == (1,)

    def test_leaf_histograms_log_smoothed(self):
        # A pure single-node tree: leaf histogram must be
        # log((h*freq + 1) / (total + C)) with inverted class frequency.
        x = np.zeros((10, 2), np.float32)
        y = np.zeros(10, np.int32)
        forest = ForestTrainer(
            TrainerConfig(num_trees=1, use_bootstrap=False)
        ).learn(x, y, class_counts=[2])
        freq = _inverted_class_frequency(y.astype(np.int64), 2)
        h0 = 10 * freq[0]
        want0 = np.log((h0 + 1) / (h0 + 2))
        want1 = np.log(1 / (h0 + 2))
        np.testing.assert_allclose(
            forest.leaf_hist[0, 0, 0], [want0, want1], rtol=1e-5
        )

    def test_roundtrip_through_reference_format(self, tmp_path):
        from rovinasemanticsegmentation_tpu.models.forest import (
            load_forest,
            save_forest,
        )

        rng = np.random.default_rng(5)
        x = rng.normal(size=(300, 6)).astype(np.float32)
        y = np.stack([(x[:, 0] > 0), (x[:, 1] > 0)], 1).astype(np.int32)
        forest = ForestTrainer(
            TrainerConfig(num_trees=2, max_depth=6, min_split_examples=5)
        ).learn(x, y, class_counts=[2, 2])
        path = str(tmp_path / "f.dat")
        save_forest(path, forest)
        loaded = load_forest(path)
        p1 = np.asarray(ForestPredictor(forest).log_posterior(jnp.asarray(x)))
        p2 = np.asarray(ForestPredictor(loaded).log_posterior(jnp.asarray(x)))
        np.testing.assert_allclose(p1, p2, rtol=1e-6)


class TestDeviceGrowth:
    """grow_tree_device: whole-tree-in-one-dispatch growth (round 3)."""

    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(600, 10)).astype(np.float32)
        y = ((x[:, 0] > 0) + 2 * (x[:, 4] > 0.3)).astype(np.int32)
        return x, y

    @pytest.mark.slow  # stop rules covered fast by test_min_split_respected_on_device
    def test_both_modes_learn_and_respect_stops(self, data):
        x, y = data
        for dg in (False, True):
            cfg = TrainerConfig(
                num_trees=2, max_depth=6, min_split_examples=20,
                seed=5, use_bootstrap=False, device_growth=dg,
            )
            forest = ForestTrainer(cfg).learn(
                x, y, class_counts=[4], multi_label=False, progress=False
            )
            pred = ForestPredictor(forest)
            post = np.asarray(pred.log_posterior(jnp.asarray(x)))[:, 0, :4]
            acc = (post.argmax(1) == y).mean()
            assert acc > 0.9, f"device_growth={dg}: acc {acc}"
            for t in range(2):
                view = forest.tree_view(t)
                lc = np.asarray(view.left_child)
                nn = len(lc)
                internal = lc != 0
                # Children exist, in pairs, inside the table.
                assert (lc[internal] + 1 < nn).all()
                # Depth bound: longest root-to-leaf path <= max_depth + 1.
                depth = np.zeros(nn, np.int32)
                for node in range(nn):
                    if lc[node]:
                        depth[lc[node]] = depth[node] + 1
                        depth[lc[node] + 1] = depth[node] + 1
                assert depth.max() <= cfg.max_depth + 1

    def test_min_split_respected_on_device(self, data):
        x, y = data
        cfg = TrainerConfig(
            num_trees=1, max_depth=20, min_split_examples=100,
            seed=3, use_bootstrap=False, device_growth=True,
        )
        forest = ForestTrainer(cfg).learn(
            x, y, class_counts=[4], multi_label=False, progress=False
        )
        view = forest.tree_view(0)
        lc = np.asarray(view.left_child)
        # Count examples reaching each node; any SPLIT node must have held
        # >= min_split examples (learning.cpp:521-531 semantics).
        node = np.zeros(len(x), np.int64)
        counts = np.bincount(node, minlength=len(lc))
        sf = np.asarray(view.split_feature)
        th = np.asarray(view.threshold)
        for _ in range(25):
            live = lc[node] != 0
            nxt = lc[node] + (
                x[np.arange(len(x)), sf[node]] >= th[node]
            ).astype(np.int64)
            node = np.where(live, nxt, node)
        counts = np.bincount(node, minlength=len(lc))
        # Reconstruct per-node example counts bottom-up.
        order = np.argsort(-np.arange(len(lc)))  # children before parents
        full = counts.astype(np.int64).copy()
        for n in range(len(lc) - 1, -1, -1):
            if lc[n]:
                full[n] = full[lc[n]] + full[lc[n] + 1]
        split_nodes = lc != 0
        assert (full[split_nodes] >= cfg.min_split_examples).all()

    @pytest.mark.slow  # same fused==per-tree equality asserted in dryrun_multichip
    def test_fused_forest_matches_per_tree_device_growth(self, data, tmp_path):
        """The one-dispatch fused forest (grow_forest_device) must grow
        BIT-IDENTICAL trees to the per-tree device path: the rng streams
        depend only on (seed, f_pad), which the two paths share. The
        per-tree path is reached through its public surface (per-tree
        checkpointing forces the tree loop)."""
        x, y = data
        cfg = TrainerConfig(
            num_trees=3, max_depth=7, min_split_examples=15, seed=9,
            device_growth=True,
        )
        fused = ForestTrainer(cfg).learn(
            x, y, class_counts=[4], multi_label=False, progress=False
        )
        per_tree = ForestTrainer(cfg).learn(
            x, y, class_counts=[4], multi_label=False, progress=False,
            checkpoint_path=str(tmp_path / "ckpt.npz"),
        )
        for t in range(cfg.num_trees):
            a, b = fused.tree_view(t), per_tree.tree_view(t)
            np.testing.assert_array_equal(a.split_feature, b.split_feature)
            np.testing.assert_array_equal(a.left_child, b.left_child)
            np.testing.assert_allclose(a.threshold, b.threshold, rtol=1e-7)
            np.testing.assert_allclose(a.leaf_hist, b.leaf_hist, rtol=1e-5)

    def test_fused_overflow_retry_keeps_per_tree_identity(
        self, data, tmp_path, monkeypatch
    ):
        """Bucket overflow in the fused path must regrow ONLY the
        overflowing trees (round-4 advisor, medium): rng streams depend on
        f_pad, so regrowing everything at 4x changes every tree and breaks
        the fused==per-tree bit-identity. Tiny starter buckets (patched
        into the SHARED formula, so both public paths escalate alike)
        force retries; equality must survive them."""
        import rovinasemanticsegmentation_tpu.train.forest_trainer as ft

        x, y = data
        monkeypatch.setattr(ft, "_forest_buckets", lambda ns, cfg: (4, 256))
        calls = []
        orig_gfd = ft.grow_forest_device

        def spy(*a, **kw):
            calls.append((kw["f_pad"], kw["cap"], int(a[2].shape[0])))
            return orig_gfd(*a, **kw)

        monkeypatch.setattr(ft, "grow_forest_device", spy)
        cfg = TrainerConfig(
            num_trees=3, max_depth=9, min_split_examples=5, seed=9,
            device_growth=True,
        )
        fused = ForestTrainer(cfg).learn(
            x, y, class_counts=[4], multi_label=False, progress=False
        )
        per_tree = ForestTrainer(cfg).learn(
            x, y, class_counts=[4], multi_label=False, progress=False,
            checkpoint_path=str(tmp_path / "ckpt.npz"),
        )
        # The tiny frontier bucket must actually have forced retries.
        assert len(calls) >= 2 and calls[0] == (4, 256, 3)
        for t in range(cfg.num_trees):
            a, b = fused.tree_view(t), per_tree.tree_view(t)
            np.testing.assert_array_equal(a.split_feature, b.split_feature)
            np.testing.assert_array_equal(a.left_child, b.left_child)
            np.testing.assert_allclose(a.threshold, b.threshold, rtol=1e-7)
            np.testing.assert_allclose(a.leaf_hist, b.leaf_hist, rtol=1e-5)

    def test_fused_retry_regrows_only_overflowing_trees(self, monkeypatch):
        """Pure retry-logic check with a scripted grow_forest_device: tree 1
        overflows its frontier on the first dispatch; the retry dispatch
        must contain ONLY tree 1, at f_pad*4, same cap."""
        import rovinasemanticsegmentation_tpu.train.forest_trainer as ft

        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 4)).astype(np.float32)
        y = (x[:, 0] > 0).astype(np.int32)[:, None]
        calls = []

        def fake_gfd(xd, yd, idx, seeds, msp, mcs, cw, *, f_pad, cap, **kw):
            t = idx.shape[0]
            calls.append((f_pad, cap, t, np.asarray(seeds).tolist()))
            sf = jnp.zeros((t, cap), jnp.int32)
            th = jnp.zeros((t, cap), jnp.float32)
            lc = jnp.zeros((t, cap), jnp.int32)
            dep = jnp.zeros((t, cap), jnp.int32)
            nn = jnp.ones((t,), jnp.int32)
            # First dispatch: middle tree reports frontier overflow.
            if len(calls) == 1:
                fc = jnp.asarray([0, f_pad + 1, 0][:t], jnp.int32)
            else:
                fc = jnp.zeros((t,), jnp.int32)
            return sf, th, lc, dep, nn, fc, None

        monkeypatch.setattr(ft, "grow_forest_device", fake_gfd)
        monkeypatch.setattr(
            ft, "forest_refit_device",
            lambda *a, **kw: jnp.zeros(
                (a[3].shape[0], kw["num_nodes"], 1, kw["num_classes"]),
                jnp.float32,
            ),
        )
        cfg = TrainerConfig(
            num_trees=3, max_depth=5, min_split_examples=4, seed=1,
            device_growth=True,
        )
        out = ft._grow_forest_fused(
            jnp.asarray(x), y, jnp.asarray(y), jnp.zeros((1, 4)),
            cfg, 4, [0, 1, 2], len(x),
        )
        assert len(out) == 3
        assert len(calls) == 2
        f_pad0 = calls[0][0]
        assert calls[0][2] == 3
        # Retry: only one tree, frontier bucket x4, cap unchanged.
        assert calls[1][0] == f_pad0 * 4
        assert calls[1][1] == calls[0][1]
        assert calls[1][2] == 1
        # And it is tree 1's seed stream that was regrown.
        assert calls[1][3] == [calls[0][3][1]]

    def test_overflow_flag_reports_and_retry_matches(self, data):
        from rovinasemanticsegmentation_tpu.train.forest_trainer import (
            grow_tree_device,
        )

        x, y = data
        xd = jnp.asarray(x)
        yd = jnp.asarray(y[:, None].astype(np.int32))
        kw = dict(
            max_depth=12, k=3, num_classes=4, num_layers=1,
        )
        args = (
            xd, yd, jnp.uint32(99), jnp.float32(2.0), jnp.float32(1.0),
            jnp.ones(4, jnp.float32),
        )
        # Tiny frontier bucket: growth must stop with the overflow flag set
        # rather than mis-grow.
        sf_s, th_s, lc_s, dep_s, nn_s, fc_s, _ = grow_tree_device(
            *args, f_pad=4, cap=4096, **kw
        )
        assert int(fc_s) > 4  # overflow reported
        # Ample buckets: flag clear, and the grown prefix of the tiny run
        # matches (deterministic growth).
        sf, th, lc, dep, nn, fc, _ = grow_tree_device(
            *args, f_pad=256, cap=4096, **kw
        )
        # Clean exit: neither retry condition holds (a small pending
        # frontier at the depth limit is a normal exit, not overflow).
        assert int(fc) <= 256 and int(nn) + 2 * int(fc) <= 4096
        assert int(nn) > int(nn_s)


class TestBinnedSplitSearch:
    """split_bins > 0: the sort-free binned device split search."""

    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(600, 10)).astype(np.float32)
        y = ((x[:, 0] > 0) + 2 * (x[:, 4] > 0.3)).astype(np.int32)
        return x, y

    def test_bin_threshold_consistency(self):
        """bin(x) <= j  <=>  x < boundaries[d, j] — including duplicate
        values (equal values must always share a bin, so a stored
        boundary threshold partitions EXACTLY like the binned search)."""
        from rovinasemanticsegmentation_tpu.train.forest_trainer import (
            build_feature_bins,
        )

        rng = np.random.default_rng(3)
        # Column 0 continuous, column 1 heavy duplicates (integer-ish).
        x = np.stack(
            [
                rng.normal(size=500),
                rng.integers(0, 7, size=500).astype(np.float64),
            ],
            axis=1,
        ).astype(np.float32)
        xb, bnd = build_feature_bins(jnp.asarray(x), num_bins=16)
        xb, bnd = np.asarray(xb), np.asarray(bnd)
        for d in range(2):
            for j in range(bnd.shape[1]):
                np.testing.assert_array_equal(
                    xb[:, d] <= j, x[:, d] < bnd[d, j],
                    err_msg=f"feature {d} boundary {j}",
                )

    def test_binned_slot_matches_histogram_oracle(self):
        """_binned_slot_search vs a literal numpy sweep over boundary
        candidates (same objective as oracle_best_split restricted to the
        bin-boundary candidate set)."""
        from rovinasemanticsegmentation_tpu.train.forest_trainer import (
            _binned_slot_search,
        )

        rng = np.random.default_rng(5)
        ns, f, c, b = 300, 4, 3, 8
        bv = rng.integers(0, b, ns).astype(np.int32)
        seg = rng.integers(0, f + 1, ns).astype(np.int32)  # f = inactive
        cls = rng.integers(0, c, ns).astype(np.int32)
        cw = np.ones(c, np.float32)
        obj, bidx, lm, rm = _binned_slot_search(
            jnp.asarray(bv), jnp.asarray(seg), jnp.asarray(cls),
            jnp.asarray(cw), f, c, b,
        )
        obj, bidx = np.asarray(obj), np.asarray(bidx)
        lm, rm = np.asarray(lm), np.asarray(rm)

        def ent(h):
            m = h.sum()
            out = m * np.log2(m) if m > 0 else 0.0
            for v in h:
                if v > 0:
                    out -= v * np.log2(v)
            return out

        for s in range(f):
            sel = seg == s
            best, best_j, best_lm, best_rm = np.inf, 0, 0.0, 0.0
            hist = np.zeros((b, c))
            for i in np.nonzero(sel)[0]:
                hist[bv[i], cls[i]] += 1
            for j in range(b - 1):
                left = hist[: j + 1].sum(0)
                right = hist[j + 1 :].sum(0)
                if left.sum() == 0 or right.sum() == 0:
                    continue
                o = ent(left) + ent(right)
                if o < best:
                    best, best_j = o, j
                    best_lm, best_rm = left.sum(), right.sum()
            if np.isinf(best):
                assert np.isinf(obj[s])
            else:
                np.testing.assert_allclose(obj[s], best, rtol=1e-5)
                assert bidx[s] == best_j
                assert lm[s] == best_lm and rm[s] == best_rm

    def test_binned_fused_matches_per_tree(self, data, tmp_path):
        """Fused-forest and per-tree device growth stay BIT-IDENTICAL in
        binned mode (shared full-dataset bin table + shared rng streams)."""
        x, y = data
        cfg = TrainerConfig(
            num_trees=2, max_depth=6, min_split_examples=15, seed=9,
            device_growth=True, split_bins=32,
        )
        fused = ForestTrainer(cfg).learn(
            x, y, class_counts=[4], multi_label=False, progress=False
        )
        per_tree = ForestTrainer(cfg).learn(
            x, y, class_counts=[4], multi_label=False, progress=False,
            checkpoint_path=str(tmp_path / "ckpt.npz"),
        )
        for t in range(cfg.num_trees):
            a, b = fused.tree_view(t), per_tree.tree_view(t)
            np.testing.assert_array_equal(a.split_feature, b.split_feature)
            np.testing.assert_array_equal(a.left_child, b.left_child)
            np.testing.assert_allclose(a.threshold, b.threshold, rtol=1e-7)
            np.testing.assert_allclose(a.leaf_hist, b.leaf_hist, rtol=1e-5)

    def test_binned_heldout_accuracy_parity(self, data):
        """Binned (256 global quantile bins) vs exact split search: the
        candidate restriction must not cost accuracy on held-out data
        (SURVEY §7 'hard parts' — the sanctioned statistical-parity bar).

        The data is workload-shaped: ROVINA feature vectors are 363/366
        integer-valued Lab patch intensities (feature_extractor.h:125-175)
        plus 3 continuous channels (depth/height/normal angle) — for the
        integer features 256 value-based bins make the binned candidate
        set near-exact. (On ALL-continuous data a global quantile sketch
        measurably trails the exact node-local sweep at depth — that
        regime is not this workload.)"""
        rng = np.random.default_rng(17)

        def make(n):
            xi = rng.integers(0, 256, size=(n, 10)).astype(np.float32)
            xc = rng.normal(size=(n, 2)).astype(np.float32)
            x = np.concatenate([xi, xc], axis=1)
            y = (
                (x[:, 0] > 127) + 2 * ((x[:, 5] > 64) & (x[:, 11] > 0.3))
            ).astype(np.int32)
            return x, y

        x, y = make(1500)
        xt, yt = make(800)
        accs = {}
        for bins in (0, 256):
            cfg = TrainerConfig(
                num_trees=2, max_depth=8, min_split_examples=10, seed=2,
                device_growth=True, split_bins=bins,
            )
            forest = ForestTrainer(cfg).learn(
                x, y, class_counts=[4], multi_label=False, progress=False
            )
            post = np.asarray(
                ForestPredictor(forest).log_posterior(jnp.asarray(xt))
            )[:, 0, :4]
            accs[bins] = (post.argmax(1) == yt).mean()
        assert accs[256] >= accs[0] - 0.02, accs
