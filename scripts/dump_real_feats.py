"""Extract one real VGA frame's features on the TPU and cache them as npz
for CPU-side experiments (exp_repack_sim.py). Same frame recipe as
exp_descent_real.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from rovinasemanticsegmentation_tpu.utils import tpu_lock

if not tpu_lock.acquire():
    print("tpu_lock: held past timeout; skipping", file=sys.stderr)
    raise SystemExit(3)

from rovinasemanticsegmentation_tpu.features.extractor import (
    FeatureConfig,
    FeatureExtractor,
)
from rovinasemanticsegmentation_tpu.utils.calibration import Calibration
from scripts.exp_descent_real import H, W, STRIDE, make_depth

rng = np.random.default_rng(0)
calib = Calibration(
    intrinsic=np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1.0]]),
    rotation=np.eye(3), translation=np.zeros(3))
rgb = np.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
depth = np.asarray(make_depth(rng))
feats = np.asarray(
    FeatureExtractor(FeatureConfig()).extract(rgb, depth, calib, STRIDE).features
)
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/real_feats_vga.npz"
np.savez_compressed(out, feats=feats)
print("saved", out, feats.shape, feats.dtype)
