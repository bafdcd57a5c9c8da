"""CLI tests on a synthetic on-disk dataset in the reference layout."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from rovinasemanticsegmentation_tpu.cli.evaluate import run_evaluation
from rovinasemanticsegmentation_tpu.features.dataset import (
    RovinaDataset,
    layer_prefixes_for,
    model_path_for,
)
from rovinasemanticsegmentation_tpu.models.forest import random_forest, save_forest
from rovinasemanticsegmentation_tpu.utils.calibration import Calibration
from rovinasemanticsegmentation_tpu.utils.config import Config
from rovinasemanticsegmentation_tpu.utils.imageio import load_color, save_color
from rovinasemanticsegmentation_tpu.utils.labels import RgbLabelConversion

H, W = 24, 32

MATERIAL = [
    {"name": "A", "color": [255, 0, 0], "label": 0},
    {"name": "B", "color": [0, 255, 0], "label": 1},
    {"name": "C", "color": [0, 0, 255], "label": 2},
    {"name": "Void", "color": [0, 0, 0], "label": -1},
]
OBJECT = [
    {"name": "X", "color": [255, 0, 0], "label": 0},
    {"name": "Y", "color": [0, 255, 0], "label": 1},
    {"name": "Void", "color": [0, 0, 0], "label": -1},
]


def build_dataset(root, names=("img0", "img1"), shared=True):
    """Create a dataset tree in the reference layout + config.json."""
    root = str(root)
    for sub in ("rgb", "depth", "mat_labels", "obj_labels", "calibration",
                "splits", "models", "mat_results", "obj_results"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    mat_conv = RgbLabelConversion(MATERIAL)
    obj_conv = RgbLabelConversion(OBJECT)
    for name in names:
        rgb = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        save_color(f"{root}/rgb/{name}.png", rgb)
        # Spatially smooth depth so stride-grid posteriors upsample cleanly.
        ramp = np.linspace(800, 8800, W)[None, :] + np.linspace(0, 400, H)[:, None]
        depth = (ramp + rng.normal(0, 60, (H, W))).astype(np.uint16)
        # PGM P5 16-bit
        with open(f"{root}/depth/{name}.pgm", "wb") as f:
            f.write(b"P5\n%d %d\n65535\n" % (W, H))
            f.write(depth.astype(">u2").tobytes())
        # Labels correlate with the depth feature so training has signal.
        mat = np.digitize(depth, [2000, 5000]).astype(np.int8)
        mat[0, :] = -1  # some void
        save_color(f"{root}/mat_labels/{name}_L.png", mat_conv.label_to_rgb(mat))
        obj = (depth > 4000).astype(np.int8)
        save_color(f"{root}/obj_labels/{name}_L.png", obj_conv.label_to_rgb(obj))
        Calibration(
            intrinsic=np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]]),
            rotation=np.eye(3),
            translation=np.zeros(3),
        ).save_to_file(f"{root}/calibration/{name}.json")
    with open(f"{root}/splits/all.json", "w") as f:
        json.dump(list(names), f)
    with open(f"{root}/splits/test.json", "w") as f:
        json.dump(list(names), f)

    config = {
        "root_dir": root,
        "color_dir": "rgb/", "color_ext": ".png",
        "depth_dir": "depth/", "depth_ext": ".pgm",
        "material_label_dir": "mat_labels/", "material_label_ext": "_L.png",
        "object_label_dir": "obj_labels/", "object_label_ext": "_L.png",
        "material_result_dir": "mat_results/", "material_result_ext": ".png",
        "object_result_dir": "obj_results/", "object_result_ext": ".png",
        "calibration_dir": "calibration/", "calibration_ext": ".json",
        "file_names_train": "splits/all.json",
        "file_names_test": "splits/test.json",
        "training_label_prefix": "shared" if shared else "material",
        "patch_size": 15, "patch_size_reduce": 5,
        "training_sample_stride": 5,
        "max_depth": 8, "min_split_sample": 10, "num_trees": 2,
        "feature_color_patch": True, "feature_depth": True,
        "feature_height": True, "feature_normal": True,
        "material_forest_file_name": "models/forest_material.dat",
        "object_forest_file_name": "models/forest_object.dat",
        "forest_file_name": "models/forest_shared.dat",
        "color_codings": [
            {"name": "material", "coding": MATERIAL},
            {"name": "object", "coding": OBJECT},
        ],
        "use_dense_crf": False,
        "dcrf_xyz_kernel": 0.5, "dcrf_rgb_kernel": 4.0,
        "dcrf_kernel_weight": 10.0, "dcrf_iterations": 10,
        "rf_prediction_stride": 2,
        "depth_min": 0.5, "depth_max": 15.0,
        "keyframe_skip_rotation": 0.1, "keyframe_skip_translation": 0.07,
    }
    conf_path = f"{root}/config.json"
    with open(conf_path, "w") as f:
        json.dump(config, f)
    return conf_path


class TestDataset:
    def test_load_sample(self, tmp_path):
        conf_path = build_dataset(tmp_path)
        conf = Config(conf_path)
        ds = RovinaDataset(conf, "file_names_test", ["material", "object"])
        assert len(ds) == 2
        s = ds.load(0)
        assert s.rgb.shape == (H, W, 3)
        assert s.depth.dtype == np.uint16
        assert len(s.labels) == 2
        assert (s.labels[0][0] == -1).all()  # void row survives decoding
        assert s.calibration.intrinsic[0, 0] == 20.0

    def test_prefix_helpers(self, tmp_path):
        conf = Config(build_dataset(tmp_path, shared=True))
        prefixes, shared = layer_prefixes_for(conf)
        assert prefixes == ["material", "object"] and shared
        assert model_path_for(conf).endswith("models/forest_shared.dat")
        conf2 = Config(build_dataset(tmp_path / "b", shared=False))
        prefixes2, shared2 = layer_prefixes_for(conf2)
        assert prefixes2 == ["material"] and not shared2


class TestEvaluateCli:
    def test_test_multi_end_to_end(self, tmp_path, capsys):
        conf_path = build_dataset(tmp_path)
        conf = Config(conf_path)
        rng = np.random.default_rng(1)
        forest = random_forest(
            rng, num_trees=2, depth=5, num_features=78,
            class_counts=[3, 2], max_nodes=31,
        )
        save_forest(model_path_for(conf), forest)

        accs = run_evaluation(conf, multi=True)
        out = capsys.readouterr().out
        assert "Time per image" in out
        assert "Global accuracy" in out
        assert "Intersection over union" in out
        assert len(accs) == 2
        assert accs[0].total > 0
        # Colorized result images written.
        img = load_color(str(tmp_path / "mat_results" / "img0.png"))
        assert img.shape == (H, W, 3)

    def test_wrong_mode_rejected(self, tmp_path):
        conf = Config(build_dataset(tmp_path, shared=True))
        with pytest.raises(RuntimeError, match="multi label"):
            run_evaluation(conf, multi=False)
        conf2 = Config(build_dataset(tmp_path / "c", shared=False))
        with pytest.raises(RuntimeError, match="single label"):
            run_evaluation(conf2, multi=True)


class TestTrainCli:
    @pytest.mark.slow
    def test_train_then_evaluate(self, tmp_path, capsys):
        from rovinasemanticsegmentation_tpu.cli.train import (
            extract_training_data,
        )
        from rovinasemanticsegmentation_tpu.train.forest_trainer import (
            ForestTrainer,
            TrainerConfig,
        )
        from rovinasemanticsegmentation_tpu.models.forest import save_forest

        conf = Config(build_dataset(tmp_path))
        x, y, class_counts, shared = extract_training_data(conf, verbose=False)
        assert shared and x.shape[1] == 78 and y.shape[1] == 2
        assert class_counts == [3, 2]
        # 2 images x 3 brightness x 2 flips worth of samples.
        assert len(x) > 100
        forest = ForestTrainer(TrainerConfig.from_config(conf)).learn(
            x, y, class_counts=class_counts, multi_label=shared, progress=False
        )
        save_forest(model_path_for(conf), forest)
        accs = run_evaluation(conf, multi=True, write_results=False)
        capsys.readouterr()
        # Trained on the same images: should beat chance comfortably.
        assert accs[0].global_accuracy() > 55.0
        assert accs[1].global_accuracy() > 60.0
