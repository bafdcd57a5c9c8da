"""Leaf-histogram summation variants (the 1.9 ms frame stage).

The production path (`models/forest.py::_sum_leaf_histograms`) gathers a
17-float row per (tree, point) — 4 x 76.8k rows/frame from [N~10.7k, 17]
tables. At TPU gather granularity every gathered row touches a whole
[8, 128] f32 tile (~4 KB), so the stage moves ~1.2 GB/frame for 26 MB of
useful data; the row width (17 of 128 lanes) is the waste.

Variants (all bit-parity-checked against A before timing):

  A  production: per-tree vmap'd row gather of [N, 17], sum over trees.
  B  global-id: one gather from the [T*N, 17] concatenated table with
     leaves + t*N ids (same rows, one dispatch-level gather op).
  C  transposed: tables as [17, N] (channels on sublanes), gather along
     LANES with per-point ids; out [17, P] then one transpose back.
  D  bf16 rows: A with bfloat16 tables (halves bytes per touched tile;
     posteriors are log-hist sums consumed by argmax/softmax, and the
     parity check is against the f32 result with a tolerance).

Usage:  python scripts/exp_hist.py [bench|parity]
The production path now resolves its layout through the ``hist_gather``
tuning key (models/forest.py::_sum_leaf_histograms — "row" | "global" |
"transposed", all bit-exact), so in bench mode the best EXACT variant is
recorded to TUNING.json (gated on a compiled TPU measurement, like every
other recorded winner). D (bf16 tables) stays measurement-only: it
changes posterior numerics, which would break the rtol-1e-6 C++ parity
contract, so it must never become a silent default.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MODE = sys.argv[1] if len(sys.argv) > 1 else "parity"

import jax
import jax.numpy as jnp
import numpy as np

# sitecustomize boots the axon TPU plugin before env vars are honored;
# re-pin here so `JAX_PLATFORMS=cpu python scripts/exp_hist.py parity`
# works offline (same trick as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rovinasemanticsegmentation_tpu.models.forest import (
    _sum_leaf_histograms,
    load_forest,
)


def variant_b(flat_all, leaves, n, lc):
    """One gather from the [T*N, LC] concatenation with global ids."""
    t = leaves.shape[1]
    gids = leaves + (jnp.arange(t, dtype=jnp.int32) * n)[None, :]  # [P, T]
    rows = jnp.take(flat_all, gids.reshape(-1), axis=0)  # [P*T, LC]
    return rows.reshape(-1, t, lc).sum(axis=1)


def variant_c(hist_t, leaves):
    """Channels on sublanes: gather along lanes, sum trees, one transpose."""
    # hist_t: [T, LC, N]; leaves: [P, T]
    gathered = jax.vmap(
        lambda h, idx: jnp.take(h, idx, axis=1), in_axes=(0, 1)
    )(hist_t, leaves)  # [T, LC, P]
    return gathered.sum(axis=0).T  # [P, LC]


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping TPU run",
              file=sys.stderr)
        raise SystemExit(3)
    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "resources",
        "bench_forest.dat",
    )
    forest = load_forest(fixture, class_counts=[8, 9])
    leaf_hist = jnp.asarray(forest.leaf_hist)  # [T, N, L, C]
    t, n, layers, c = leaf_hist.shape
    lc = layers * c
    flat = leaf_hist.reshape(t, n, lc)
    flat_all = flat.reshape(t * n, lc)
    hist_t = jnp.transpose(flat, (0, 2, 1))  # [T, LC, N]
    hist_bf = flat.astype(jnp.bfloat16)

    rng = np.random.default_rng(0)
    p = 76800 if MODE == "bench" else 4096
    # Realistic leaf ids: descend-free stand-in — leaves are the deepest
    # node ids; spatial coherence approximated by sorted runs.
    raw = rng.integers(0, n, size=(p, t), dtype=np.int32)
    raw[: p // 2] = np.sort(raw[: p // 2], axis=0)  # coherent half
    leaves = jnp.asarray(raw)

    base = np.asarray(_sum_leaf_histograms(leaf_hist, leaves))
    flat_base = base.reshape(-1, lc)

    got_b = np.asarray(jax.jit(variant_b, static_argnums=(2, 3))(
        flat_all, leaves, n, lc))
    print("B global-id:", "PARITY OK" if np.array_equal(got_b, flat_base)
          else "MISMATCH")
    got_c = np.asarray(jax.jit(variant_c)(hist_t, leaves))
    print("C transposed:", "PARITY OK" if np.array_equal(got_c, flat_base)
          else "MISMATCH")
    got_d = np.asarray(
        jax.jit(lambda h, l: variant_b(h.reshape(t * n, lc), l, n, lc))(
            hist_bf, leaves
        )
    ).astype(np.float32)
    derr = np.max(np.abs(got_d - flat_base) / np.maximum(np.abs(flat_base), 1e-3))
    print(f"D bf16: max rel err {derr:.4f} "
          f"({'acceptable' if derr < 0.02 else 'TOO LOOSE'} for log-hist argmax)")

    if MODE != "bench":
        return

    def slope(name, fn):
        times = {}
        for K in (8, 32):
            @jax.jit
            def scanner(b):
                def body(cacc, i):
                    out = fn((leaves + i) % n)
                    return cacc + jnp.sum(out.astype(jnp.float32)), ()
                tot, _ = jax.lax.scan(body, jnp.float32(0), b + jnp.arange(K))
                return tot

            float(scanner(jnp.int32(0)))
            best = 1e9
            for rep in range(1, 3):
                t0 = time.perf_counter()
                float(scanner(jnp.int32(rep * 100 + 1)))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        ms = (times[32] - times[8]) / 24 * 1000
        print(f"{name:16s} {ms:7.2f} ms/iter")
        return ms

    def safe(name, fn):
        try:
            return slope(name, fn)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            return None

    a_ms = safe("A row (prod)", lambda l: _sum_leaf_histograms(leaf_hist, l))
    b_ms = safe("B global-id", lambda l: variant_b(flat_all, l, n, lc))
    c_ms = safe("C transposed", lambda l: variant_c(hist_t, l))
    safe("D bf16 rows", lambda l: variant_b(
        hist_bf.reshape(t * n, lc), l, n, lc))

    # Record the best EXACT variant for the production path's hist_gather
    # key — only from a compiled (TPU) measurement, never interpret/CPU.
    timed = {"row": a_ms, "global": b_ms, "transposed": c_ms}
    timed = {k: v for k, v in timed.items() if v is not None}
    if timed and jax.default_backend() == "tpu":
        from rovinasemanticsegmentation_tpu.utils import tuning

        winner = min(timed, key=timed.get)
        tuning.record(
            "hist_gather", winner,
            {**{f"{k}_ms": round(v, 3) for k, v in timed.items()},
             "script": "exp_hist.py bench", "n_points": int(p)},
        )
        print(f"TUNING: hist_gather={winner} "
              + " ".join(f"{k}={v:.2f}ms" for k, v in timed.items()))


if __name__ == "__main__":
    main()
