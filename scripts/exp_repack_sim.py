"""CPU simulation: would a mid-descent repack (compact still-active points
into fewer tiles) cut the descent kernel's level-tile count on REAL data?

The production kernel (ops/forest_pallas.py) early-exits per TILE: a
1024-point tile keeps sweeping all four trees until EVERY point in it has
reached a leaf in EVERY tree, so one deep straggler keeps a whole tile's
worth of gather sweeps alive. This script descends the trained fixture on
one real extracted frame with NumPy, computes the per-point
max-over-trees leaf depth, and compares:

  actual     level-tiles with the current per-tile early exit
  repack@L   run all tiles to level L, compact active points (spatial
             order preserved), continue with per-tile early exit
  sorted@L   same but active points sorted by remaining depth (upper
             bound for any repack permutation)
  ideal      perfect per-level compaction (lower bound)

Pure CPU, no TPU lock needed. Informs whether a repack stage in
find_leaves_pallas is worth building.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from rovinasemanticsegmentation_tpu.features.extractor import (
    FeatureConfig,
    FeatureExtractor,
)
from rovinasemanticsegmentation_tpu.models.forest import load_forest
from rovinasemanticsegmentation_tpu.utils.calibration import Calibration

H, W, STRIDE = 480, 640, 2
TILE = 1024


def make_depth(r):
    ys, xs = np.mgrid[0:H, 0:W]
    depth = (3000.0 + 1500.0 * np.sin(xs / W * np.pi * r.uniform(0.5, 2.0))
             + 1000.0 * (ys / H) * r.uniform(0.5, 3.0))
    for _ in range(6):
        y0, x0 = r.integers(0, H - 80), r.integers(0, W - 120)
        bh, bw = r.integers(60, 180), r.integers(80, 240)
        depth[y0:y0 + bh, x0:x0 + bw] = r.uniform(700, 2500)
    depth += r.normal(0, 15, (H, W))
    depth[r.random((H, W)) < 0.02] = 0
    return np.clip(depth, 0, 15500).astype(np.uint16)


def point_depths(forest, feats):
    """[P] int: per point, max over trees of the level its leaf sits at."""
    p = feats.shape[0]
    depth = np.zeros(p, dtype=np.int32)
    for t in range(forest.num_trees):
        sf = forest.split_feature[t]
        th = forest.threshold[t]
        lc = forest.left_child[t]
        node = np.zeros(p, dtype=np.int64)
        d = np.zeros(p, dtype=np.int32)
        for level in range(forest.max_depth + 1):
            inner = lc[node] > 0
            if not inner.any():
                break
            x = feats[np.arange(p), sf[node]]
            go_right = (x >= th[node]) & inner
            go_left = (x < th[node]) & inner
            node = np.where(go_left, lc[node], np.where(go_right, lc[node] + 1, node))
            d += inner.astype(np.int32)
        depth = np.maximum(depth, d)
    return depth


def tiles_cost(depths, tile=TILE):
    """Level-tiles executed with per-tile early exit over this ordering."""
    n = len(depths)
    pad = (-n) % tile
    d = np.concatenate([depths, np.zeros(pad, dtype=depths.dtype)])
    per_tile_max = d.reshape(-1, tile).max(axis=1)
    return int(per_tile_max.sum())


def main():
    rng = np.random.default_rng(0)
    fixture = os.path.join(os.path.dirname(__file__), "..", "resources",
                           "bench_forest.dat")
    forest = load_forest(fixture, class_counts=[8, 9])
    cache = "/tmp/real_feats_vga.npz"
    if os.path.exists(cache):
        feats = np.load(cache)["feats"]
    else:
        # CPU extraction of a full VGA frame takes >10 min (interpret-mode
        # scans); run scripts/dump_real_feats.py on TPU once to produce the
        # cache, or fall back to a quarter frame here.
        global H, W
        H, W = 240, 320
        calib = Calibration(
            intrinsic=np.array(
                [[262.5, 0, 160], [0, 262.5, 120], [0, 0, 1.0]]),
            rotation=np.eye(3), translation=np.zeros(3))
        rgb = np.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
        depth = np.asarray(make_depth(rng))
        feats = FeatureExtractor(FeatureConfig()).extract(
            rgb, depth, calib, STRIDE).features
        feats = np.asarray(feats)
    print(f"features {feats.shape}, forest max_depth={forest.max_depth}")

    d = point_depths(forest, feats)
    print(f"point depth: mean={d.mean():.1f} p50={np.percentile(d,50):.0f} "
          f"p90={np.percentile(d,90):.0f} p99={np.percentile(d,99):.0f} "
          f"max={d.max()}")

    actual = tiles_cost(d)
    # ideal: perfect per-level compaction
    active = np.array([(d > lv).sum() for lv in range(d.max())])
    ideal = int(np.ceil(active / TILE).sum())
    print(f"actual level-tiles (spatial order, per-tile exit): {actual}")
    print(f"ideal  level-tiles (perfect compaction):           {ideal} "
          f"({actual/ideal:.2f}x headroom)")

    for L in (8, 10, 12, 14, 16, 18):
        # phase 1: every tile runs to min(its max depth, L)
        n = len(d)
        pad = (-n) % TILE
        dp = np.concatenate([d, np.zeros(pad, dtype=d.dtype)])
        tmax = dp.reshape(-1, TILE).max(axis=1)
        p1 = int(np.minimum(tmax, L).sum())
        act = d[d > L]
        p2_spatial = tiles_cost(act - L)
        p2_sorted = tiles_cost(np.sort(act - L))
        print(f"repack@{L:2d}: phase1={p1:5d} active={len(act):6d} "
              f"p2(spatial)={p2_spatial:5d} p2(sorted)={p2_sorted:5d} "
              f"total={p1+p2_spatial:5d} ({actual/(p1+p2_spatial):.2f}x) "
              f"sorted_total={p1+p2_sorted} ({actual/(p1+p2_sorted):.2f}x)")


if __name__ == "__main__":
    main()
