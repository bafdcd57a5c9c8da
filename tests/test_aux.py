"""Auxiliary subsystems: profiling, checkpointing, resumable training, node CLI."""

import json
import time
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rovinasemanticsegmentation_tpu.models.forest import (
    ForestPredictor,
    random_forest,
)
from rovinasemanticsegmentation_tpu.train.forest_trainer import (
    ForestTrainer,
    TrainerConfig,
)
from rovinasemanticsegmentation_tpu.utils.checkpoint import (
    TrainingCheckpoint,
    convert_npz_to_reference,
    convert_reference_to_npz,
    load_forest_npz,
    save_forest_npz,
)
from rovinasemanticsegmentation_tpu.utils.profiling import StepTimer, device_trace


class TestProfiling:
    def test_step_timer(self):
        timer = StepTimer()
        with timer.span("a"):
            time.sleep(0.01)
        out = timer.time("b", lambda x: jnp.sum(x * 2), jnp.ones(16))
        assert float(out) == 32.0
        assert timer.stats["a"].count == 1
        assert timer.stats["a"].mean >= 0.01
        assert timer.stats["b"].count == 1
        report = timer.report()
        assert "a" in report and "mean ms" in report

    def test_device_trace_noop(self):
        with device_trace(None):
            pass  # no-op path


class TestCheckpoint:
    def test_npz_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        forest = random_forest(rng, 2, 5, 20, [3, 4], max_nodes=31)
        p = str(tmp_path / "f.npz")
        save_forest_npz(p, forest)
        loaded = load_forest_npz(p)
        assert loaded.class_counts == forest.class_counts
        np.testing.assert_allclose(loaded.leaf_hist, forest.leaf_hist)
        x = jnp.asarray(rng.normal(size=(16, 20)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(ForestPredictor(loaded).log_posterior(x)),
            np.asarray(ForestPredictor(forest).log_posterior(x)),
        )

    def test_dat_npz_converters(self, tmp_path):
        from rovinasemanticsegmentation_tpu.models.forest import save_forest

        rng = np.random.default_rng(1)
        forest = random_forest(rng, 2, 4, 10, [3], max_nodes=15)
        dat = str(tmp_path / "f.dat")
        npz = str(tmp_path / "f.npz")
        dat2 = str(tmp_path / "f2.dat")
        save_forest(dat, forest)
        f1 = convert_reference_to_npz(dat, npz)
        f2 = convert_npz_to_reference(npz, dat2)
        assert open(dat, "rb").read() == open(dat2, "rb").read()

    @pytest.mark.slow  # checkpoint bundle/converters covered fast by the roundtrip tests
    def test_resumable_training(self, tmp_path):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(400, 8)).astype(np.float32)
        y = (x[:, 1] > 0).astype(np.int32)
        ckpt = str(tmp_path / "train.npz")
        cfg = TrainerConfig(num_trees=3, max_depth=5, min_split_examples=5, seed=7)

        full = ForestTrainer(cfg).learn(x, y, class_counts=[2], progress=False)

        # Train 1 tree, "crash", resume for the remaining 2.
        cfg1 = TrainerConfig(**{**cfg.__dict__, "num_trees": 1})
        ForestTrainer(cfg1).learn(
            x, y, class_counts=[2], progress=False, checkpoint_path=ckpt
        )
        meta, partial = TrainingCheckpoint.load(ckpt)
        assert meta.completed_trees == 1 and partial.num_trees == 1
        resumed = ForestTrainer(cfg).learn(
            x, y, class_counts=[2], progress=False, checkpoint_path=ckpt
        )
        # Per-tree RNG streams: the resumed forest equals the one-shot run.
        assert resumed.node_counts == full.node_counts
        np.testing.assert_allclose(resumed.threshold, full.threshold)
        np.testing.assert_allclose(resumed.leaf_hist, full.leaf_hist)


class TestNodeCli:
    def test_node_builds_and_serves(self, tmp_path):
        from rovinasemanticsegmentation_tpu.cli.node import build_segmenter
        from rovinasemanticsegmentation_tpu.models.forest import save_forest
        from rovinasemanticsegmentation_tpu.serve.services import (
            SegmentationServiceServer,
        )

        config = {
            "root_dir": str(tmp_path),
            "color_codings": [
                {"name": "material", "coding": [
                    {"name": "A", "color": [255, 0, 0], "label": 0},
                    {"name": "Unknown", "color": [50, 50, 50], "label": 1},
                    {"name": "Void", "color": [0, 0, 0], "label": -1},
                ]},
            ],
            "use_dense_crf": False,
            "dcrf_xyz_kernel": 0.5, "dcrf_rgb_kernel": 4.0,
            "dcrf_kernel_weight": 10.0, "dcrf_iterations": 10,
            "rf_prediction_stride": 2,
            "depth_min": 0.5, "depth_max": 15.0,
            "keyframe_skip_rotation": 0.1, "keyframe_skip_translation": 0.07,
            "patch_size": 15, "patch_size_reduce": 5,
            "feature_color_patch": True, "feature_depth": True,
            "feature_height": True, "feature_normal": True,
        }
        conf_path = tmp_path / "config.json"
        conf_path.write_text(json.dumps(config))
        rng = np.random.default_rng(0)
        forest = random_forest(rng, 2, 4, 78, [2], max_nodes=15)
        forest_path = str(tmp_path / "forest.dat")
        save_forest(forest_path, forest)

        seg = build_segmenter({
            "conf": str(conf_path),
            "topics": json.dumps(["/cam/rgb", "/cam/depth"]),
            "forest": forest_path,
        })
        assert seg.layer_names == ["material"]
        server = SegmentationServiceServer(seg)
        server.start()
        try:
            with urllib.request.urlopen(
                server.address + "/semantic_segmentation/information"
            ) as r:
                info = json.load(r)
            assert info["class_counts"] == [2]
        finally:
            server.stop()

    def test_external_mode(self, tmp_path):
        from rovinasemanticsegmentation_tpu.cli.node import build_segmenter

        config = {
            "root_dir": str(tmp_path),
            "color_codings": [
                {"name": "material", "coding": [
                    {"name": "A", "color": [255, 0, 0], "label": 0},
                    {"name": "B", "color": [0, 255, 0], "label": 1},
                    {"name": "C", "color": [0, 0, 255], "label": 2},
                    {"name": "Void", "color": [0, 0, 0], "label": -1},
                ]},
            ],
            "use_dense_crf": False,
            "dcrf_xyz_kernel": 0.5, "dcrf_rgb_kernel": 4.0,
            "dcrf_kernel_weight": 10.0, "dcrf_iterations": 10,
            "rf_prediction_stride": 2,
            "depth_min": 0.5, "depth_max": 15.0,
            "keyframe_skip_rotation": 0.1, "keyframe_skip_translation": 0.07,
            "patch_size": 15, "patch_size_reduce": 5,
            "feature_color_patch": True, "feature_depth": True,
            "feature_height": True, "feature_normal": True,
        }
        conf_path = tmp_path / "config.json"
        conf_path.write_text(json.dumps(config))
        seg = build_segmenter({
            "conf": str(conf_path),
            "topics": json.dumps(["/cam/rgb", "/cam/depth"]),
            "external_semantics": "true",
        })
        assert seg._external is not None
        out = seg._external(
            np.zeros((8, 8, 3), np.uint8),
            np.ones((8, 8, 3), np.float32),
        )
        assert out[0].shape == (8, 8, 3)


class TestMcmc:
    def test_finds_minimum(self):
        from rovinasemanticsegmentation_tpu.utils.mcmc import (
            GeometricCooling,
            simulated_annealing,
        )

        # Minimize (x - 3)^2 over noisy proposals.
        best, e = simulated_annealing(
            initial_state=10.0,
            energy=lambda x: (x - 3.0) ** 2,
            propose=lambda x, rng: x + rng.normal(0, 0.5),
            num_steps=2000,
            cooling=GeometricCooling(start=2.0, alpha=0.995),
            seed=1,
        )
        assert abs(best - 3.0) < 0.3
        assert e < 0.1
