"""A/B: per-frame-loop extract vs frame-vmapped extract at bench scale.

exp_extract_split.py attributed the batched extract's cost to many SMALL
per-frame ops (lab 2.3 + patches 4.1 + normals 5.1 + misc ~2 ms/kf): the
B=10 loop issues 10x every [240,320]-sized op sequentially.  jax.vmap over
the frame axis turns those into single [10,240,320] ops — same math, 10x
the parallel work per op, one patches kernel with a batched grid.

Variants run INTERLEAVED in one process (the dev tunnel is bimodal across
processes — bench.py's epoch comments — so cross-process comparisons lie):

  loop   the production composition (_batch_frame_impl_pallas's extract)
  vmap   jax.vmap(_extract_impl) over frames

Also asserts bitwise equality of features and masks between the two.

Usage: python scripts/exp_batchex.py
"""

import os
import sys
import time
from functools import partial

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
from rovinasemanticsegmentation_tpu.ops.color import warm_lab_tables
from rovinasemanticsegmentation_tpu.utils import tpu_lock

H, W, STRIDE, B = 480, 640, 2, 10
REPS = 10
ROUNDS = 4


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

    rgb = jnp.asarray(np.stack(
        [rng.integers(0, 256, (H, W, 3), dtype=np.uint8) for _ in range(B)]))
    depth = jnp.asarray(np.stack([make_depth(rng) for _ in range(B)]))
    kinv = jnp.asarray(np.tile(np.linalg.inv(
        np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]])
    )[None].astype(np.float32), (B, 1, 1)))
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (B, 1, 1)))
    trans = jnp.zeros((B, 3), jnp.float32)
    dmin, dmax = jnp.float32(cfg.d_min), jnp.float32(cfg.d_max)

    impl = partial(
        _extract_impl,
        stride=STRIDE, patch_size=cfg.patch_size,
        reduce_size=cfg.patch_size_reduce,
        use_color_patch=cfg.use_color_patch, use_depth=cfg.use_depth,
        use_height=cfg.use_height, use_normal=cfg.use_normal,
    )

    def perturb(e):
        return (rgb ^ e.astype(jnp.uint8),
                jnp.where(depth > 0, depth + e.astype(jnp.uint16), 0))

    @jax.jit
    def f_loop(e):
        rgb_b, depth_b = perturb(e)
        fs, ms = [], []
        for i in range(B):
            f, m, _, _ = impl(rgb_b[i], depth_b[i], kinv[i], rot[i],
                              trans[i], dmin, dmax)
            fs.append(f)
            ms.append(m)
        return jnp.concatenate(fs, axis=0), jnp.stack(ms)

    @jax.jit
    def f_vmap(e):
        rgb_b, depth_b = perturb(e)
        f, m, _, _ = jax.vmap(
            impl, in_axes=(0, 0, 0, 0, 0, None, None)
        )(rgb_b, depth_b, kinv, rot, trans, dmin, dmax)
        return f.reshape(-1, f.shape[-1]), m

    # Parity first (bitwise: vmap only batches, never reassociates).
    fa, ma = jax.tree.map(np.asarray, f_loop(jnp.int32(3)))
    fb, mb = jax.tree.map(np.asarray, f_vmap(jnp.int32(3)))
    exact = bool((fa == fb).all() and (ma == mb).all())
    print(f"parity: exact={exact} "
          f"max|df|={np.abs(fa - fb).max():.3g}")
    if not exact:
        bad = np.argwhere(fa != fb)
        print(f"  first mismatches (row, col): {bad[:5].tolist()}")

    timings = {"loop": [], "vmap": []}
    fns = [("loop", f_loop), ("vmap", f_vmap)]
    for name, fn in fns:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jnp.int32(1)))
        print(f"{name} compiled in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
    for rnd in range(ROUNDS):
        for name, fn in fns:
            best = 1e9
            for rep in range(REPS):
                e = jnp.int32(rnd * 100 + rep * 13 + 7)
                t0 = time.perf_counter()
                jax.block_until_ready(fn(e))
                best = min(best, time.perf_counter() - t0)
            timings[name].append(best * 1000)
    for name, ts in timings.items():
        best = min(ts)
        print(f"{name:5s} {best:8.2f} ms/batch ({best / B:6.2f} ms/kf)  "
              f"rounds={[f'{t:.1f}' for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
