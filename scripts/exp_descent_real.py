"""Descent pack-variant slope on REAL features (not N(0,1)).

exp_descent.py benches the descent kernel on uniform-random features,
where the early-exit while_loop settles at a different leaf-depth
distribution than the trained fixture sees on real frames (profile_slope
measures 11.8 ms there vs exp_descent's 7.9 ms on random inputs — the
data, not the kernel config, is the difference). The transpose-pack
decision must therefore be made on the REAL distribution: this script
extracts one genuine VGA frame's features through the production
FeatureExtractor and slopes find_leaves_pallas with transpose_pack
False vs True, recording the winner to TUNING.json with the
distribution noted in the evidence.

Usage: python scripts/exp_descent_real.py
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
    FeatureExtractor,
)
from rovinasemanticsegmentation_tpu.models.forest import load_forest
from rovinasemanticsegmentation_tpu.ops.forest_pallas import (
    PallasForestPredictor,
    find_leaves_pallas,
)
from rovinasemanticsegmentation_tpu.utils.calibration import Calibration

H, W, STRIDE = 480, 640, 2
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


def slope(name, fn, feats):
    times = {}
    for K in (K1, K2):
        @jax.jit
        def scanner(base):
            def body(c, i):
                lv = fn(feats + i.astype(jnp.float32) * 1e-5)
                return c + jnp.sum(lv), ()
            tot, _ = jax.lax.scan(
                body, jnp.int32(0), base + jnp.arange(K))
            return tot

        int(scanner(jnp.int32(0)))  # compile + settle
        best = 1e9
        for rep in range(1, 3):
            t0 = time.perf_counter()
            int(scanner(jnp.int32(rep * 1000 + 1)))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    ms = (times[K2] - times[K1]) / (K2 - K1) * 1000
    print(f"{name:24s} {ms:7.3f} ms/iter  "
          f"(T{K1}={times[K1]*1e3:.0f} T{K2}={times[K2]*1e3:.0f})")
    return ms


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping", file=sys.stderr)
        raise SystemExit(3)

    rng = np.random.default_rng(0)
    cfg = FeatureConfig()
    fixture = os.path.join(os.path.dirname(__file__), "..", "resources",
                           "bench_forest.dat")
    forest = load_forest(fixture, class_counts=[8, 9])
    pp = PallasForestPredictor(forest)
    calib = Calibration(
        intrinsic=np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1.0]]),
        rotation=np.eye(3), translation=np.zeros(3))
    rgb = np.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    depth = np.asarray(make_depth(rng))
    feats = FeatureExtractor(cfg).extract(rgb, depth, calib, STRIDE).features
    feats = jnp.asarray(feats)
    print(f"real features: {feats.shape}, fixture {forest.node_counts}")

    def run(tp):
        def fn(f):
            return find_leaves_pallas(
                f, pp.meta, pp.thresholds, pp.level_offsets,
                pp.level_chunks, num_levels=pp.lm.num_levels,
                feat_bits=pp.lm.feat_bits, transpose_pack=tp)
        return fn

    base = np.asarray(run(False)(feats))
    tpv = np.asarray(run(True)(feats))
    assert np.array_equal(base, tpv), "transpose-pack parity broke"

    a_ms = slope("diag-gather (False)", run(False), feats)
    b_ms = slope("transpose-pack (True)", run(True), feats)

    from rovinasemanticsegmentation_tpu.utils import tuning
    tuning.record(
        "descent_transpose", bool(b_ms < a_ms),
        {"script": "exp_descent_real.py", "features": "real-frame VGA",
         "diag_ms": round(a_ms, 3), "transpose_ms": round(b_ms, 3),
         "n_points": int(feats.shape[0])},
    )
    print(f"TUNING: descent_transpose={b_ms < a_ms} "
          f"diag={a_ms:.2f}ms transpose={b_ms:.2f}ms (real features)")


if __name__ == "__main__":
    main()
