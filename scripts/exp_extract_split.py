"""Cumulative sub-stage split INSIDE the batched extract stage.

exp_frame_split.py attributed 27.8 of the 42 ms/kf batched frame path to
`_extract_impl`, yet the isolated per-stage slopes (TPU_SMOKE.json) sum to
only ~9.8 ms for the same work (lab 0.04 + patches 3.9 + backproj+normals
5.8).  This harness times CUMULATIVE prefixes of the exact extract
composition at bench scale (B=10 VGA frames, stride 2) so the successive
differences attribute the batched cost per sub-stage and expose where the
~18 ms/kf hides (kernel-call overhead, layout copies around the
concatenate, or a stage whose isolated slope lied).

Stages:
  lab+pad      rgb_to_lab8 + reflect_pad per frame
  +patches     + extract_patches_pallas (+ the [P, 363] f32 cast/reshape)
  +backproj    + full-res backprojection + height gather
  +normals     + normal_angles_grid
  +concat      + the [P, 366] concatenate + mask where  (== full extract)

Usage: python scripts/exp_extract_split.py
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

from rovinasemanticsegmentation_tpu.features.extractor import FeatureConfig
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

    @jax.jit
    def perturb(e):
        return (rgb ^ e.astype(jnp.uint8),
                jnp.where(depth > 0, depth + e.astype(jnp.uint16), 0))

    # Per-frame pieces mirroring _extract_impl exactly (extractor.py:137-198).
    def piece_lab(rgb_i):
        lab = rgb_to_lab8(rgb_i)
        return reflect_pad_image(lab, cfg.patch_size)

    def piece_grid(depth_i):
        depth_grid_mm = depth_i[ys2d, xs2d].reshape(-1)
        mask = depth_valid_mask(depth_grid_mm, dmin, dmax)
        depth_m = depth_grid_mm.astype(jnp.float32) / 1000.0
        return mask, depth_m

    def piece_patches(padded, mask, depth_m):
        depth_grid = jnp.where(mask, depth_m, 0.0).reshape(gys.size, gxs.size)
        patches = extract_patches_pallas(
            padded, depth_grid, patch_size=cfg.patch_size,
            reduce_size=cfg.patch_size_reduce, stride=STRIDE,
            rows_per_program=rpp)
        return patches.reshape(
            ys2d.size, cfg.patch_size_reduce ** 2 * 3).astype(jnp.float32)

    def piece_backproj(depth_i, i):
        points = backproject(depth_i, kinv[i], rot[i], trans[i], dmin, dmax)
        height = points[ys2d, xs2d, 2].reshape(-1)
        return points, jnp.nan_to_num(height)

    def stage_fns():
        @jax.jit
        def s_lab(e):
            rgb_b, _ = perturb(e)
            return sum(jnp.sum(piece_lab(rgb_b[i]).astype(jnp.int32))
                       for i in range(B))

        @jax.jit
        def s_patches(e):
            rgb_b, depth_b = perturb(e)
            acc = jnp.float32(0)
            for i in range(B):
                padded = piece_lab(rgb_b[i])
                mask, depth_m = piece_grid(depth_b[i])
                acc += jnp.sum(piece_patches(padded, mask, depth_m))
                acc += jnp.sum(mask) + jnp.sum(depth_m)
            return acc

        @jax.jit
        def s_backproj(e):
            rgb_b, depth_b = perturb(e)
            acc = jnp.float32(0)
            for i in range(B):
                padded = piece_lab(rgb_b[i])
                mask, depth_m = piece_grid(depth_b[i])
                acc += jnp.sum(piece_patches(padded, mask, depth_m))
                points, height = piece_backproj(depth_b[i], i)
                acc += jnp.sum(height) + jnp.sum(mask) + jnp.sum(depth_m)
            return acc

        @jax.jit
        def s_normals(e):
            rgb_b, depth_b = perturb(e)
            acc = jnp.float32(0)
            for i in range(B):
                padded = piece_lab(rgb_b[i])
                mask, depth_m = piece_grid(depth_b[i])
                acc += jnp.sum(piece_patches(padded, mask, depth_m))
                points, height = piece_backproj(depth_b[i], i)
                angles = normal_angles_grid(points, STRIDE)
                acc += (jnp.sum(height) + jnp.sum(angles)
                        + jnp.sum(mask) + jnp.sum(depth_m))
            return acc

        @jax.jit
        def s_concat(e):
            rgb_b, depth_b = perturb(e)
            acc = jnp.float32(0)
            for i in range(B):
                padded = piece_lab(rgb_b[i])
                mask, depth_m = piece_grid(depth_b[i])
                pat = piece_patches(padded, mask, depth_m)
                points, height = piece_backproj(depth_b[i], i)
                angles = normal_angles_grid(points, STRIDE)
                feats = jnp.concatenate(
                    [pat, depth_m[:, None], height[:, None],
                     angles.reshape(-1)[:, None]], axis=1)
                feats = jnp.where(mask[:, None], feats, 0.0)
                acc += jnp.sum(feats) + jnp.sum(mask)
            return acc

        return [("lab+pad", s_lab), ("+patches", s_patches),
                ("+backproj", s_backproj), ("+normals", s_normals),
                ("+concat(full)", s_concat)]

    abs_ms = {}
    stages = stage_fns()
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
        if tpu_lock.deadline_expired(60):
            print("deadline; stopping early", file=sys.stderr)
            break

    prev = 0.0
    print("\nsub-stage attribution (diffs, per keyframe):")
    for name, _ in stages:
        if name not in abs_ms:
            break
        d = (abs_ms[name] - prev) / B
        print(f"  {name:14s} {d:7.2f} ms/kf")
        prev = abs_ms[name]
    return 0


if __name__ == "__main__":
    sys.exit(main())
