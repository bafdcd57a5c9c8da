"""Phase-resolved timing of fused forest growth (VERDICT r4 item 3).

bench_train measured 397 s warm (exact) / 249 s cold (binned 256) for
2 trees x 100k x 366 depth-30, yet the slope-profiled level step costs
only ~66-106 ms (scripts/profile_train.py) — sum-of-parts says ~4-7 s.
This isolates where the rest goes, phase by phase, warm (each phase
re-run with perturbed inputs to defeat the runtime's same-input
memoization):

  bins     build_feature_bins on [N, 366]            (binned mode, once)
  grow8    grow_forest_device max_depth=8  (while_loop ~9 iterations)
  grow16   grow_forest_device max_depth=16 (~17 iterations)
  -> per-level in-loop cost = (grow16 - grow8) / 8, vs the profiled
     level-step sum; a large gap indicts the vmap+while_loop composition
     rather than the level math.
  refit    forest_refit_device at the bench node counts

Usage: python scripts/exp_growth.py [bins]   (default 256; 0 = exact)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rovinasemanticsegmentation_tpu.train.forest_trainer import (  # noqa: E402
    TrainerConfig,
    _forest_buckets,
    build_feature_bins,
    forest_refit_device,
    grow_forest_device,
)
from rovinasemanticsegmentation_tpu.utils import tpu_lock  # noqa: E402

BINS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N = int(os.environ.get("EG_N", 100_000))
T = int(os.environ.get("EG_T", 2))
D = 366


def timeit(name, fn, reps=2, pick=lambda out: out):
    """Times fn(r) end-to-end, MATERIALIZING pick(out) on the host:
    block_until_ready returns early on the axon backend (ROADMAP rules),
    so only a value download proves the execution finished. ``pick``
    selects a small output (e.g. the node-count scalar) whose value
    depends on the whole computation."""
    np.asarray(pick(fn(0)))  # compile + settle
    best = 1e9
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        np.asarray(pick(fn(r)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:8s} {best:9.3f} s", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, D)).astype(np.float32)
    labels = np.stack(
        [
            feats[:, :8].argmax(axis=1).astype(np.int32),
            feats[:, 8:17].argmax(axis=1).astype(np.int32),
        ],
        axis=1,
    )
    x_full = jnp.asarray(feats)
    y_dev = jnp.asarray(labels)
    cfg = TrainerConfig(
        num_trees=T, max_depth=30, min_split_examples=50, split_bins=BINS
    )
    f_pad, cap = _forest_buckets(N, cfg)
    print(f"f_pad={f_pad} cap={cap} bins={BINS}", flush=True)
    k = 20  # ceil(sqrt(366))
    c = 9

    idx0 = rng.integers(0, N, size=(T, N)).astype(np.int32)
    idx_dev = jnp.asarray(idx0)
    cw = jnp.ones((T, c), jnp.float32)

    results = {}
    if BINS > 0:
        # Perturb one element to defeat memoization; same cost profile.
        def bins_fn(r):
            xp = x_full.at[0, 0].add(np.float32(r) * 1e-6)
            return build_feature_bins(xp, num_bins=BINS)

        results["bins"] = timeit("bins", bins_fn, pick=lambda o: o[1][:, :2])
        xb_full, bnd = build_feature_bins(x_full, num_bins=BINS)
        jax.block_until_ready((xb_full, bnd))
    else:
        xb_full = bnd = None

    def grow(max_depth):
        def fn(r):
            return grow_forest_device(
                x_full, y_dev, idx_dev,
                jnp.asarray(np.uint32([1000 + r, 2000 + r])),
                jnp.float32(50.0), jnp.float32(1.0), cw,
                f_pad=f_pad, cap=cap, max_depth=max_depth, k=k,
                num_classes=c, num_layers=2,
                xb_full=xb_full, boundaries=bnd, num_bins=BINS,
            )

        return fn

    results["grow8"] = timeit("grow8", grow(8), pick=lambda o: o[4])
    results["grow16"] = timeit("grow16", grow(16), pick=lambda o: o[4])
    per_level = (results["grow16"] - results["grow8"]) / 8
    print(f"per-level in-loop: {per_level*1000:.1f} ms", flush=True)
    if os.environ.get("EG_FULL"):
        results["grow30"] = timeit("grow30", grow(30), reps=1, pick=lambda o: o[4])

    # Refit at bench-like table sizes.
    sf, th, lc, dep, nn, fc, _ = grow(16)(0)
    nn_np = np.asarray(nn)
    nn_b = max(256, 1 << int(nn_np.max() - 1).bit_length())
    freqs = jnp.ones((2, c), jnp.float32)

    def refit_fn(r):
        return forest_refit_device(
            x_full.at[0, 0].add(np.float32(r) * 1e-6), y_dev, freqs,
            sf[:, :nn_b], th[:, :nn_b], lc[:, :nn_b],
            num_nodes=nn_b, num_classes=c, max_depth=32,
        )

    results["refit"] = timeit("refit", refit_fn, pick=lambda o: o[:, 0, 0, 0])

    import json

    print(json.dumps({"bins": BINS, "N": N, "T": T,
                      "s": {k2: round(v, 3) for k2, v in results.items()},
                      "per_level_ms": round(per_level * 1000, 1)}))


if __name__ == "__main__":
    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping", file=sys.stderr)
        sys.exit(0)
    main()
