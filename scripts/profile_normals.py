"""Slope-method sub-stage profiling of backproject+normals (6.1 ms total).

Stages: backproject, depth-change map, banded chamfer, gradients+integral
stack, phase-split box sums + finish. Identifies which of the 6.1 ms to
attack (suspect: the [H, W, 8] integral stack keeps 8 channels on lanes).
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

from rovinasemanticsegmentation_tpu.ops.geometry import backproject
from rovinasemanticsegmentation_tpu.ops import normals as nm

H, W = 480, 640
STRIDE = 2
K1, K2 = 8, 32


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
    Kinv = jnp.asarray(np.linalg.inv(
        np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]])))
    depth = jnp.asarray(make_depth(rng))
    pts = backproject(depth, Kinv, jnp.eye(3), jnp.zeros(3),
                      jnp.float32(0.5), jnp.float32(15.0))
    z = pts[..., 2]
    thresh = 0.02 * (jnp.abs(z) + 1.0) * 2.0
    invalid = jnp.isnan(z)
    ys_full = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs_full = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    z_r = nm._shift(z, 0, -1)
    z_d = nm._shift(z, -1, 0)
    change = ((xs_full < W - 1) & (invalid | jnp.isnan(z_r)
                                   | (jnp.abs(z - z_r) > thresh))) | \
             ((ys_full < H - 1) & (invalid | jnp.isnan(z_d)
                                   | (jnp.abs(z - z_d) > thresh)))

    def st_backproject(i, d):
        return backproject(d + (i % 251).astype(jnp.uint16), Kinv,
                           jnp.eye(3), jnp.zeros(3),
                           jnp.float32(0.5), jnp.float32(15.0))

    def st_change(i, p):
        zz = p[..., 2] + i.astype(jnp.float32) * 1e-6
        th = 0.02 * (jnp.abs(zz) + 1.0) * 2.0
        zr = nm._shift(zz, 0, -1)
        zd = nm._shift(zz, -1, 0)
        cx = (xs_full < W - 1) & (jnp.isnan(zz) | jnp.isnan(zr)
                                  | (jnp.abs(zz - zr) > th))
        cy = (ys_full < H - 1) & (jnp.isnan(zz) | jnp.isnan(zd)
                                  | (jnp.abs(zz - zd) > th))
        return (cx | cy | jnp.roll(cx, 1, axis=1)
                | jnp.roll(cy, 1, axis=0))

    def st_chamfer(i, ch):
        return nm.chamfer_distance_map(
            ch ^ (jax.lax.rem(i, jnp.int32(7)) == 99), saturation=10.0,
            variant="banded")

    def st_chamfer_iter(i, ch):
        return nm.chamfer_distance_map(
            ch ^ (jax.lax.rem(i, jnp.int32(7)) == 99), saturation=10.0,
            variant="iter")

    def st_grad_integral(i, p):
        pp = p + i.astype(jnp.float32) * 1e-6
        grad_x = nm._shift(pp, 0, -1) - nm._shift(pp, 0, 1)
        grad_y = nm._shift(pp, -1, 0) - nm._shift(pp, 1, 0)
        gx_valid = ~jnp.isnan(grad_x[..., 0])
        gy_valid = ~jnp.isnan(grad_y[..., 0])
        stack = jnp.concatenate(
            [jnp.nan_to_num(grad_x), jnp.nan_to_num(grad_y),
             gx_valid[..., None].astype(jnp.float32),
             gy_valid[..., None].astype(jnp.float32)], axis=-1)
        return nm._masked_integral(stack)

    def st_all(i, p):
        return nm.normal_angles_grid(
            p + i.astype(jnp.float32) * 1e-6, STRIDE,
            chamfer_variant="banded")

    def st_all_iter(i, p):
        return nm.normal_angles_grid(
            p + i.astype(jnp.float32) * 1e-6, STRIDE,
            chamfer_variant="iter")

    slope("backproject", st_backproject, depth)
    slope("change map", st_change, pts)
    slope("banded chamfer", st_chamfer, change)
    slope("iterated chamfer", st_chamfer_iter, change)
    slope("grads + integral stack", st_grad_integral, pts)
    banded_ms = slope("normals (whole, banded)", st_all, pts)
    iter_ms = slope("normals (whole, iter)", st_all_iter, pts)

    # Record the production default (utils/tuning.py); end-to-end variant
    # agreement is pinned by tests/test_feature_ops.py. Only a COMPILED
    # measurement may set the default — a CPU dry-run's winner reflects
    # interpreter/scan overheads, not the chip.
    if jax.default_backend() == "tpu":
        from rovinasemanticsegmentation_tpu.utils import tuning

        winner = "iter" if iter_ms <= banded_ms else "banded"
        tuning.record(
            "chamfer_variant", winner,
            {"banded_ms": round(banded_ms, 3), "iter_ms": round(iter_ms, 3),
             "script": "profile_normals.py"},
        )
        print(f"TUNING: chamfer_variant={winner}")
    else:
        print("TUNING: not on TPU — winner not recorded")


if __name__ == "__main__":
    main()
