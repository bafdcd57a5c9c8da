"""Cumulative stage split of the BATCHED frame path at bench scale.

The official bench measures frame_path_ms_per_kf ~48 ms at batch 10, but
the per-stage smoke table (TPU_SMOKE.json, unbatched slope method) sums to
only ~23 ms — the gap is inside the one batched executable. This harness
times CUMULATIVE prefixes of the exact `_batch_frame_impl_pallas`
composition (extract -> +descent -> +hist -> +posterior tail) as separate
dispatches on device-staged inputs; successive DIFFERENCES attribute the
batched cost per stage while the constant per-dispatch host latency
(~5 ms RTT) cancels.

Reference cost drivers mirrored from bench.py: VGA keyframes, stride 2,
trained fixture forest (resources/bench_forest.dat), batch 10.

Usage: python scripts/exp_frame_split.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rovinasemanticsegmentation_tpu.features.extractor import (
    FeatureConfig,
    _extract_impl,
)
from rovinasemanticsegmentation_tpu.models.forest import (
    _sum_leaf_histograms,
    load_forest,
)
from rovinasemanticsegmentation_tpu.ops.forest_pallas import (
    PallasForestPredictor,
    find_leaves_pallas,
)
from rovinasemanticsegmentation_tpu.pipelines.single_frame import (
    _posterior_maps,
)
from rovinasemanticsegmentation_tpu.utils import tpu_lock

H, W, STRIDE, B = 480, 640, 2, 10
REPS = 12


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


def main():
    if not tpu_lock.acquire(timeout_s=3600):
        print("could not take TPU lock", file=sys.stderr)
        return 2
    rng = np.random.default_rng(0)
    cfg = FeatureConfig()
    fixture = os.path.join(os.path.dirname(__file__), "..", "resources",
                           "bench_forest.dat")
    forest = load_forest(fixture, class_counts=[8, 9])
    pp = PallasForestPredictor(forest)

    rgb = jnp.asarray(np.stack(
        [rng.integers(0, 256, (H, W, 3), dtype=np.uint8) for _ in range(B)]))
    depth = jnp.asarray(np.stack([make_depth(rng) for _ in range(B)]))
    kinv = jnp.asarray(np.tile(np.linalg.inv(
        np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]])
    )[None].astype(np.float32), (B, 1, 1)))
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (B, 1, 1)))
    trans = jnp.zeros((B, 3), jnp.float32)
    dmin, dmax = jnp.float32(cfg.d_min), jnp.float32(cfg.d_max)

    def extract_all(rgb_b, depth_b):
        feats, masks = [], []
        for i in range(B):
            f, m, _, _ = _extract_impl(
                rgb_b[i], depth_b[i], kinv[i], rot[i], trans[i], dmin, dmax,
                stride=STRIDE, patch_size=cfg.patch_size,
                reduce_size=cfg.patch_size_reduce,
                use_color_patch=cfg.use_color_patch, use_depth=cfg.use_depth,
                use_height=cfg.use_height, use_normal=cfg.use_normal,
            )
            feats.append(f)
            masks.append(m)
        return jnp.concatenate(feats, axis=0), masks

    @jax.jit
    def perturb(e):
        return (rgb ^ e.astype(jnp.uint8),
                jnp.where(depth > 0, depth + e.astype(jnp.uint16), 0))

    @jax.jit
    def s_extract(e):
        feats, masks = extract_all(*perturb(e))
        return jnp.sum(feats) + sum(jnp.sum(m) for m in masks)

    @jax.jit
    def s_descent(e):
        feats, masks = extract_all(*perturb(e))
        leaves = find_leaves_pallas(
            feats, pp.meta, pp.thresholds, pp.level_offsets, pp.level_chunks,
            num_levels=pp.lm.num_levels, feat_bits=pp.lm.feat_bits)
        return jnp.sum(leaves) + sum(jnp.sum(m) for m in masks)

    @jax.jit
    def s_hist(e):
        feats, masks = extract_all(*perturb(e))
        leaves = find_leaves_pallas(
            feats, pp.meta, pp.thresholds, pp.level_offsets, pp.level_chunks,
            num_levels=pp.lm.num_levels, feat_bits=pp.lm.feat_bits)
        post = _sum_leaf_histograms(pp.leaf_hist, leaves)
        return jnp.sum(post) + sum(jnp.sum(m) for m in masks)

    @jax.jit
    def s_full(e):
        rgb_b, depth_b = perturb(e)
        feats, masks = extract_all(rgb_b, depth_b)
        leaves = find_leaves_pallas(
            feats, pp.meta, pp.thresholds, pp.level_offsets, pp.level_chunks,
            num_levels=pp.lm.num_levels, feat_bits=pp.lm.feat_bits)
        post = _sum_leaf_histograms(pp.leaf_hist, leaves)
        p = masks[0].shape[0]
        acc = jnp.float32(0)
        for i in range(B):
            posts, labels = _posterior_maps(
                post[i * p:(i + 1) * p], masks[i], depth_b[i], STRIDE,
                tuple(pp.class_counts), 0.0, H, W)
            acc += sum(jnp.sum(x) for x in posts)
            acc += sum(jnp.sum(l.astype(jnp.int32)) for l in labels)
        return acc

    stages = [("extract", s_extract), ("+descent", s_descent),
              ("+hist", s_hist), ("+tail(full)", s_full)]
    abs_ms = {}
    for name, fn in stages:
        t0 = time.perf_counter()
        float(fn(jnp.int32(1)))  # compile
        print(f"{name:14s} compiled in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
        best = 1e9
        for rep in range(REPS):
            e = jnp.int32(rep * 13 + 7)
            t0 = time.perf_counter()
            float(fn(e))
            best = min(best, time.perf_counter() - t0)
        abs_ms[name] = best * 1000
        print(f"{name:14s} abs {best * 1000:8.2f} ms/batch "
              f"({best * 1000 / B:6.2f} ms/kf)")

    prev = 0.0
    print("\nstage attribution (diffs, per keyframe):")
    for name, _ in stages:
        d = (abs_ms[name] - prev) / B
        print(f"  {name:14s} {d:7.2f} ms/kf")
        prev = abs_ms[name]
    print(f"  TOTAL          {abs_ms[stages[-1][0]] / B:7.2f} ms/kf "
          f"(incl. one ~5ms dispatch RTT / batch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
