"""Isolate the ~15 ms/kf gap between _extract_impl-at-bench-scale (28.07
ms/kf, exp_frame_split.py s_extract) and the faithful per-frame mirror of
its body (13.40 ms/kf, exp_extract_split.py s_concat).

The two differ only in composition details, so each variant below toggles
exactly one:

  A  per-frame mirror, per-frame sums              (baseline: 13.4 ms/kf)
  B  per-frame mirror + axis-0 concat across frames, one sum
  C  _extract_impl called per frame, per-frame sums (no cross-frame concat)
  D  _extract_impl + axis-0 concat (== exp_frame_split s_extract: 28 ms/kf)

B-A = cost of the cross-frame concatenate / lost sum-fusion.
C-A = cost hidden inside _extract_impl itself (ys/xs returns, part order).

Usage: python scripts/exp_concat.py
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
from rovinasemanticsegmentation_tpu.ops.color import rgb_to_lab8, warm_lab_tables
from rovinasemanticsegmentation_tpu.ops.geometry import backproject, depth_valid_mask
from rovinasemanticsegmentation_tpu.ops.normals import normal_angles_grid
from rovinasemanticsegmentation_tpu.ops.patches import reflect_pad_image
from rovinasemanticsegmentation_tpu.ops.patches_pallas import extract_patches_pallas
from rovinasemanticsegmentation_tpu.utils import tpu_lock, tuning

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
    warm_lab_tables()
    rng = np.random.default_rng(0)
    cfg = FeatureConfig()
    rpp = int(tuning.get("patches_rows_per_program", 8))

    rgb = jnp.asarray(np.stack(
        [rng.integers(0, 256, (H, W, 3), dtype=np.uint8) for _ in range(B)]))
    depth = jnp.asarray(np.stack([make_depth(rng) for _ in range(B)]))
    kinv = jnp.asarray(np.tile(np.linalg.inv(
        np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]])
    )[None].astype(np.float32), (B, 1, 1)))
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (B, 1, 1)))
    trans = jnp.zeros((B, 3), jnp.float32)
    dmin, dmax = jnp.float32(cfg.d_min), jnp.float32(cfg.d_max)

    gys = jnp.arange(0, H, STRIDE, dtype=jnp.int32)
    gxs = jnp.arange(0, W, STRIDE, dtype=jnp.int32)
    ys2d = jnp.broadcast_to(gys[:, None], (gys.size, gxs.size))
    xs2d = jnp.broadcast_to(gxs[None, :], (gys.size, gxs.size))

    def perturb(e):
        return (rgb ^ e.astype(jnp.uint8),
                jnp.where(depth > 0, depth + e.astype(jnp.uint16), 0))

    def mirror_frame(rgb_i, depth_i, i):
        lab = rgb_to_lab8(rgb_i)
        padded = reflect_pad_image(lab, cfg.patch_size)
        depth_grid_mm = depth_i[ys2d, xs2d].reshape(-1)
        mask = depth_valid_mask(depth_grid_mm, dmin, dmax)
        depth_m = depth_grid_mm.astype(jnp.float32) / 1000.0
        depth_grid = jnp.where(mask, depth_m, 0.0).reshape(gys.size, gxs.size)
        pat = extract_patches_pallas(
            padded, depth_grid, patch_size=cfg.patch_size,
            reduce_size=cfg.patch_size_reduce, stride=STRIDE,
            rows_per_program=rpp,
        ).reshape(ys2d.size, cfg.patch_size_reduce ** 2 * 3).astype(jnp.float32)
        points = backproject(depth_i, kinv[i], rot[i], trans[i], dmin, dmax)
        height = jnp.nan_to_num(points[ys2d, xs2d, 2].reshape(-1))
        angles = normal_angles_grid(points, STRIDE)
        feats = jnp.concatenate(
            [pat, depth_m[:, None], height[:, None],
             angles.reshape(-1)[:, None]], axis=1)
        return jnp.where(mask[:, None], feats, 0.0), mask

    @jax.jit
    def v_a(e):
        rgb_b, depth_b = perturb(e)
        acc = jnp.float32(0)
        for i in range(B):
            f, m = mirror_frame(rgb_b[i], depth_b[i], i)
            acc += jnp.sum(f) + jnp.sum(m)
        return acc

    @jax.jit
    def v_b(e):
        rgb_b, depth_b = perturb(e)
        fs, ms = [], []
        for i in range(B):
            f, m = mirror_frame(rgb_b[i], depth_b[i], i)
            fs.append(f)
            ms.append(m)
        return jnp.sum(jnp.concatenate(fs, axis=0)) + sum(
            jnp.sum(m) for m in ms)

    def impl_frame(rgb_i, depth_i, i):
        f, m, _, _ = _extract_impl(
            rgb_i, depth_i, kinv[i], rot[i], trans[i], dmin, dmax,
            stride=STRIDE, patch_size=cfg.patch_size,
            reduce_size=cfg.patch_size_reduce,
            use_color_patch=cfg.use_color_patch, use_depth=cfg.use_depth,
            use_height=cfg.use_height, use_normal=cfg.use_normal,
        )
        return f, m

    @jax.jit
    def v_c(e):
        rgb_b, depth_b = perturb(e)
        acc = jnp.float32(0)
        for i in range(B):
            f, m = impl_frame(rgb_b[i], depth_b[i], i)
            acc += jnp.sum(f) + jnp.sum(m)
        return acc

    @jax.jit
    def v_d(e):
        rgb_b, depth_b = perturb(e)
        fs, ms = [], []
        for i in range(B):
            f, m = impl_frame(rgb_b[i], depth_b[i], i)
            fs.append(f)
            ms.append(m)
        return jnp.sum(jnp.concatenate(fs, axis=0)) + sum(
            jnp.sum(m) for m in ms)

    for name, fn in [("A mirror/sums", v_a), ("B mirror/concat", v_b),
                     ("C impl/sums", v_c), ("D impl/concat", v_d)]:
        t0 = time.perf_counter()
        float(fn(jnp.int32(1)))
        print(f"{name:16s} compiled in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
        best = 1e9
        for rep in range(REPS):
            t0 = time.perf_counter()
            float(fn(jnp.int32(rep * 13 + 7)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:16s} {best * 1000:8.2f} ms/batch "
              f"({best * 1000 / B:6.2f} ms/kf)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
