"""End-to-end feature extractor tests on synthetic frames."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rovinasemanticsegmentation_tpu.features.extractor import (
    ExtractType,
    FeatureConfig,
    FeatureExtractor,
)
from rovinasemanticsegmentation_tpu.utils.calibration import Calibration
from rovinasemanticsegmentation_tpu.utils.config import Config


def synthetic_frame(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    depth = rng.integers(600, 8000, (h, w)).astype(np.uint16)
    depth[0:4, 0:4] = 100  # too close -> invalid
    depth[5, 5] = 20000  # too far -> invalid
    calib = Calibration(
        intrinsic=np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]]),
        rotation=np.eye(3),
        translation=np.zeros(3),
    )
    return rgb, depth, calib


SMALL_CONFIG = FeatureConfig(patch_size=15, patch_size_reduce=5)


class TestExtractor:
    def test_shapes_and_mask(self):
        rgb, depth, calib = synthetic_frame()
        fx = FeatureExtractor(SMALL_CONFIG)
        batch = fx.extract(rgb, depth, calib, stride=4)
        grid = (12, 16)
        assert batch.grid_shape == grid
        p = grid[0] * grid[1]
        assert batch.features.shape == (p, SMALL_CONFIG.feature_length)
        assert SMALL_CONFIG.feature_length == 5 * 5 * 3 + 3
        mask = np.asarray(batch.mask)
        # Invalid near-depth corner grid points masked out.
        assert not mask[0]
        assert mask.sum() > 0.8 * p
        # Masked rows zeroed.
        feats = np.asarray(batch.features)
        assert (feats[~mask] == 0).all()

    def test_depth_and_height_features(self):
        rgb, depth, calib = synthetic_frame()
        fx = FeatureExtractor(SMALL_CONFIG)
        batch = fx.extract(rgb, depth, calib, stride=4)
        feats = np.asarray(batch.features)
        mask = np.asarray(batch.mask)
        d_feat = feats[:, 75]
        h_feat = feats[:, 76]
        want_d = depth[batch.ys, batch.xs].astype(np.float32) / 1000.0
        np.testing.assert_allclose(d_feat[mask], want_d[mask], rtol=1e-6)
        # Identity extrinsics: height = depth (z of K^-1 backprojection).
        np.testing.assert_allclose(h_feat[mask], want_d[mask], rtol=1e-5)

    def test_normal_feature_range(self):
        rgb, depth, calib = synthetic_frame()
        fx = FeatureExtractor(SMALL_CONFIG)
        batch = fx.extract(rgb, depth, calib, stride=4)
        n_feat = np.asarray(batch.features)[:, 77][np.asarray(batch.mask)]
        assert (((n_feat >= 0) & (n_feat <= np.pi)) | (n_feat == -2)).all()

    def test_labeled_extraction_positive_mode(self):
        rgb, depth, calib = synthetic_frame()
        h, w = depth.shape
        lab0 = np.zeros((h, w), dtype=np.int8)
        lab0[:, : w // 2] = -1  # left half unlabeled
        lab1 = np.full((h, w), 3, dtype=np.int8)
        fx = FeatureExtractor(SMALL_CONFIG)
        batch = fx.extract(
            rgb, depth, calib, stride=4,
            label_extraction=ExtractType.WITH_POSITIVE_LABEL,
            labels=[lab0, lab1],
        )
        mask = np.asarray(batch.mask)
        labels = np.asarray(batch.labels)
        assert labels.shape[1] == 2
        # Points in the unlabeled half must be masked out.
        assert not mask[(batch.xs < w // 2)].any()
        assert (labels[mask, 0] == 0).all() and (labels[mask, 1] == 3).all()

    def test_any_label_mode_keeps_negative(self):
        rgb, depth, calib = synthetic_frame()
        h, w = depth.shape
        lab0 = np.full((h, w), -1, dtype=np.int8)
        fx = FeatureExtractor(SMALL_CONFIG)
        batch = fx.extract(
            rgb, depth, calib, stride=4,
            label_extraction=ExtractType.WITH_ANY_LABEL,
            labels=[lab0],
        )
        mask = np.asarray(batch.mask)
        assert mask.sum() > 0  # depth-valid points kept despite label -1

    def test_feature_config_from_config(self):
        conf = Config(
            data={
                "patch_size": 77, "patch_size_reduce": 11,
                "feature_color_patch": True, "feature_depth": True,
                "feature_height": True, "feature_normal": True,
                "depth_min": 0.5, "depth_max": 15.0,
            }
        )
        cfg = FeatureConfig.from_config(conf)
        assert cfg.feature_length == 366  # 11*11*3 + 3
