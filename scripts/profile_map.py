"""Slope-method profiling of the local-map path at bench scale.

Stages: node fusion, on-device lattice build, fused multi-layer CRF, and
the whole _map_fused composition — per-iteration device ms via
(T(K2)-T(K1))/(K2-K1) over one-dispatch scan loops (see profile_slope.py
for the measurement rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rovinasemanticsegmentation_tpu.pipelines.local_map import (
    _crf_labels_multi,
    _fuse_nodes,
    _map_fused,
)
from rovinasemanticsegmentation_tpu.models.lattice import build_lattice_device

N = 30000
H, W = 480, 640
C3 = 3
KF = 5
BLOCKS = (8, 9)
M_BUCKET = 1 << 15
K1, K2 = 4, 16


def slope(name, stage, *args):
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

        float(scanner(jnp.int32(0), *args))
        best = 1e9
        for rep in range(1, 3):
            t0 = time.perf_counter()
            float(scanner(jnp.int32(rep * 1000 + 1), *args))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    ms = (times[K2] - times[K1]) / (K2 - K1) * 1000
    print(f"{name:30s} {ms:8.3f} ms/iter   (T{K1}={times[K1]*1e3:.0f} T{K2}={times[K2]*1e3:.0f})")
    return ms


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping TPU run",
              file=sys.stderr)
        raise SystemExit(3)
    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-3, 3, N), rng.uniform(0.5, 6, N)],
        axis=1,
    ).astype(np.float32)
    rgb = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    pts_d = jnp.asarray(pts)
    rgb_d = jnp.asarray(rgb)
    intr = jnp.asarray(
        np.stack([np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]],
                           np.float32)] * C3)
    )
    pose = jnp.asarray(
        np.concatenate(
            [np.stack([np.stack([np.eye(3, dtype=np.float32)] * C3)] * KF),
             np.zeros((KF, C3, 3, 1), np.float32)], axis=-1)
    )
    posts = tuple(
        tuple(
            tuple(
                jnp.asarray(rng.uniform(0, 1, (H, W, c)).astype(np.float32))
                for c in BLOCKS
            )
            for _ in range(C3)
        )
        for _ in range(KF)
    )

    feats = jnp.concatenate([pts_d * 0.5, rgb_d * 4.0], axis=1)
    built = build_lattice_device(feats, m_bucket=M_BUCKET)
    built = jax.tree_util.tree_map(jnp.asarray, built)
    fused = _fuse_nodes(
        pts_d, pose[..., :3], pose[..., 3], intr,
        jnp.float32(0.3), jnp.float32(15.0), posts,
        height=H, width=W, num_points=N,
    )

    def st_fuse(i, p, po, it, ps):
        return _fuse_nodes(
            p + i.astype(jnp.float32) * 1e-5, po[..., :3], po[..., 3],
            it, jnp.float32(0.3), jnp.float32(15.0), ps,
            height=H, width=W, num_points=N,
        )

    def st_build(i, f):
        return build_lattice_device(
            f + i.astype(jnp.float32) * 1e-5, m_bucket=M_BUCKET
        )[:8]

    def st_crf(i, fu, bu):
        return _crf_labels_multi(
            jax.tree_util.tree_map(
                lambda x: x + i.astype(jnp.float32) * 1e-6, fu
            ),
            *bu[:8], jnp.float32(5.0), BLOCKS, M_BUCKET, 10, (0, 0),
            bu[-1] > M_BUCKET,
        )

    def st_fused_all(i, p, r, po, it, ps):
        return _map_fused(
            p + i.astype(jnp.float32) * 1e-5, r, po, it, ps,
            height=H, width=W, num_points=N, blocks=BLOCKS,
            m_bucket=M_BUCKET, n_iterations=10, unknown_labels=(0, 0),
            min_distance=0.3, max_distance=15.0, xyz_kernel=0.5,
            rgb_kernel=4.0, kernel_weight=5.0,
        )[0]

    slope("fuse_nodes", st_fuse, pts_d, pose, intr, posts)
    slope("build_lattice_device", st_build, feats)
    slope("crf_labels_multi (10 it)", st_crf, fused, built)
    slope("map_fused (all)", st_fused_all, pts_d, rgb_d, pose, intr, posts)


if __name__ == "__main__":
    main()
