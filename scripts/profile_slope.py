"""Slope-method stage profiling: device ms/iter = (T(K2)-T(K1))/(K2-K1).

One scan dispatch per K; per-iteration inputs perturbed inside the scan;
the slope between two K values cancels all fixed dispatch/transfer
overhead and any first-run artifacts.

CRITICAL measurement rules for the axon tunnel (hard-won; see ROADMAP.md):
- ``jax.block_until_ready`` RETURNS EARLY while a remote compile is still
  pending, so every timed call MUST materialize to host (``float(...)``).
  Un-materialized timings can read 100-300x too fast.
- Remote compiles of Pallas-kernel-in-scan executables take minutes; the
  persistent compile cache (/root/.cache/jax_ccache) is load-bearing.
- The per-iteration perturbation must actually change the math for every
  iteration in range (use ``i``, not ``i % k``, when K > k matters).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# sitecustomize boots the axon TPU plugin before env vars are honored;
# re-pin so `JAX_PLATFORMS=cpu` control-flow dry-runs work offline.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rovinasemanticsegmentation_tpu.features.extractor import FeatureConfig
from rovinasemanticsegmentation_tpu.models.forest import (
    random_forest,
    _sum_leaf_histograms,
)
from rovinasemanticsegmentation_tpu.ops.color import rgb_to_lab8
from rovinasemanticsegmentation_tpu.ops.forest_pallas import (
    PallasForestPredictor,
    find_leaves_pallas,
)
from rovinasemanticsegmentation_tpu.ops.geometry import backproject
from rovinasemanticsegmentation_tpu.ops.normals import normal_angles_grid
from rovinasemanticsegmentation_tpu.ops.patches import reflect_pad_image
from rovinasemanticsegmentation_tpu.ops.patches_pallas import extract_patches_pallas
from rovinasemanticsegmentation_tpu.ops.resize import resize_bilinear

H, W = 480, 640
STRIDE = 2
GH, GW = H // STRIDE, W // STRIDE
P = GH * GW
D = 366
K1, K2 = 8, 32
# BATCH > 1 vmaps every stage over a leading keyframe axis (the bench's
# run_batch_stacked shapes) and reports ms per KEYFRAME, exposing how much
# of each stage's single-frame cost is dispatch/underfill amortizable by
# batching. Usage: BATCH=5 python scripts/profile_slope.py
BATCH = int(os.environ.get("BATCH", "1"))


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


def slope(name, stage, *args):
    """stage(i, *args) -> array(s); returns device ms/iter (per keyframe).

    With BATCH > 1 the stages in main() are already batched (vmap for
    image-shaped stages, point-concat for point-shaped ones); the
    reported number divides by BATCH.
    """
    times = {}
    for K in (K1, K2):
        @jax.jit
        def scanner(base, *a):
            def body(c, i):
                out = stage(i, *a)
                leaves = jax.tree_util.tree_leaves(out)
                return c + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0), base + jnp.arange(K))
            return tot

        float(scanner(jnp.int32(0), *args))  # compile + settle (materialize!)
        best = 1e9
        for rep in range(1, 3):
            t0 = time.perf_counter()
            float(scanner(jnp.int32(rep * 1000 + 1), *args))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    ms = (times[K2] - times[K1]) / (K2 - K1) * 1000 / BATCH
    unit = "ms/kf" if BATCH > 1 else "ms/iter"
    print(f"{name:34s} {ms:8.3f} {unit}   (T{K1}={times[K1]*1e3:.0f} T{K2}={times[K2]*1e3:.0f})")
    return ms


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping TPU run",
              file=sys.stderr)
        raise SystemExit(3)
    import os

    rng = np.random.default_rng(0)
    cfg = FeatureConfig()
    fixture = os.path.join(os.path.dirname(__file__), "..", "resources",
                           "bench_forest.dat")
    if os.path.exists(fixture):
        from rovinasemanticsegmentation_tpu.models.forest import load_forest
        forest = load_forest(fixture, class_counts=[8, 9])
        print(f"profiling with trained fixture forest {forest.node_counts}")
    else:
        forest = random_forest(rng, num_trees=4, depth=30, num_features=D,
                               class_counts=[8, 9], max_nodes=40001)
    pp = PallasForestPredictor(forest)
    Kinv = jnp.asarray(np.linalg.inv(
        np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]])))

    rgb = jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    depth = jnp.asarray(make_depth(rng))
    lab0 = reflect_pad_image(rgb_to_lab8(rgb), cfg.patch_size)
    dgrid = depth[::STRIDE, ::STRIDE].astype(jnp.float32) / 1000.0
    # REAL features for the descent/hist stages: the trained forest's
    # early-exit behavior is data-dependent, N(0,1) features would give
    # meaningless leaf-depth distributions.
    from rovinasemanticsegmentation_tpu.features.extractor import (
        FeatureExtractor,
    )
    from rovinasemanticsegmentation_tpu.utils.calibration import Calibration
    calib = Calibration(
        intrinsic=np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]]),
        rotation=np.eye(3), translation=np.zeros(3))
    feats = FeatureExtractor(cfg).extract(
        np.asarray(rgb), np.asarray(depth), calib, STRIDE).features
    post = jnp.asarray(rng.normal(size=(P, 2, 9)).astype(np.float32))
    leaves = find_leaves_pallas(
        feats, pp.meta, pp.thresholds, pp.level_offsets, pp.level_chunks,
        num_levels=pp.lm.num_levels, feat_bits=pp.lm.feat_bits)

    def st_lab(i, rgb):
        return reflect_pad_image(
            rgb_to_lab8(jnp.bitwise_xor(rgb, i.astype(jnp.uint8))),
            cfg.patch_size)

    def st_patches(i, lab, dg):
        # vary h pattern per iteration: scale depth slightly
        return extract_patches_pallas(
            lab, dg * (1.0 + i.astype(jnp.float32) * 1e-5),
            patch_size=cfg.patch_size, reduce_size=cfg.patch_size_reduce,
            stride=STRIDE)

    def st_normals(i, depth):
        pts = backproject(depth + (i % 251).astype(jnp.uint16), Kinv,
                          jnp.eye(3), jnp.zeros(3),
                          jnp.float32(0.5), jnp.float32(15.0))
        return normal_angles_grid(pts, STRIDE)

    def st_descent(i, f, meta, thr, off, nch):
        return find_leaves_pallas(
            f + i.astype(jnp.float32) * 1e-5, meta, thr, off, nch,
            num_levels=pp.lm.num_levels, feat_bits=pp.lm.feat_bits)

    def st_hist(i, lv, hist):
        return _sum_leaf_histograms(hist, jnp.abs(lv - (i % 97)) % lv.shape[0])

    def st_resize(i, post):
        outs = []
        for li, c in enumerate((8, 9)):
            grid_img = (post[:, li, :c] + i.astype(jnp.float32) * 1e-6
                        ).reshape(GH, GW, c)
            full = resize_bilinear(grid_img, H, W)
            outs.append(jnp.argmax(full, axis=-1).astype(jnp.int8))
        return outs

    if BATCH > 1:
        # Image-shaped stages: vmap over a stacked batch (distinct frames).
        rgbs = jnp.stack(
            [jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
             for _ in range(BATCH)]
        )
        depths = jnp.stack([jnp.asarray(make_depth(rng))
                            for _ in range(BATCH)])
        labs = jax.vmap(lambda r: reflect_pad_image(rgb_to_lab8(r),
                                                    cfg.patch_size))(rgbs)
        dgrids = (depths[:, ::STRIDE, ::STRIDE].astype(jnp.float32) / 1000.0)

        def vm(f):
            return lambda i, *a: jax.vmap(lambda *b: f(i, *b))(*a)

        # Point-shaped stages: concatenate the batch along points (what
        # run_batch_stacked does) — tree tables stay shared.
        feats_b = jnp.concatenate([feats] * BATCH)
        leaves_b = jnp.concatenate([leaves] * BATCH)
        post_b = jnp.asarray(
            rng.normal(size=(BATCH * P, 2, 9)).astype(np.float32))

        def st_resize_b(i, post):
            outs = []
            for li, c in enumerate((8, 9)):
                img = (post[:, li, :c] + i.astype(jnp.float32) * 1e-6
                       ).reshape(BATCH, GH, GW, c)
                full = jax.vmap(lambda g: resize_bilinear(g, H, W))(img)
                outs.append(jnp.argmax(full, axis=-1).astype(jnp.int8))
            return outs

        slope("lab+pad", vm(st_lab), rgbs)
        slope("patches_pallas", vm(st_patches), labs, dgrids)
        slope("backproject+normals", vm(st_normals), depths)
        slope("descent", st_descent, feats_b, pp.meta, pp.thresholds,
              pp.level_offsets, pp.level_chunks)
        slope("leaf-hist sum", st_hist, leaves_b, pp.leaf_hist)
        slope("resize+argmax", st_resize_b, post_b)
    else:
        results = {}
        results["lab+pad"] = slope("lab+pad", st_lab, rgb)
        results["patches_pallas"] = slope("patches_pallas", st_patches, lab0, dgrid)
        results["backproject+normals"] = slope(
            "backproject+normals", st_normals, depth
        )
        results["descent"] = slope(
            "descent", st_descent, feats, pp.meta, pp.thresholds,
            pp.level_offsets, pp.level_chunks,
        )
        results["leaf-hist sum"] = slope("leaf-hist sum", st_hist, leaves,
                                         pp.leaf_hist)
        results["resize+argmax"] = slope("resize+argmax", st_resize, post)
        return results
    return None


if __name__ == "__main__":
    main()
