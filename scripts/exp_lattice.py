"""Device lattice-build stage split + neighbor-resolution variants.

profile_map (round 5) measured build_lattice_device at 44.2 ms/map of the
90 ms fused map dispatch — the map path's fattest stage. This isolates
where the build spends it:

  embed      _embed_simplex: elevation/rank/barycentric (pure vector)
  dedup      + key pack + the S=N*(d+1)-row main sort, splat stream,
               offsets (sort-based vertex dedup)
  full:sort  + _blur_neighbors_sort (15*m_bucket-row merge sort + route
               back — the baseline)
  full:hash  + _blur_neighbors_hash (double-hashed open-addressing table,
               while_loop probe rounds; bit-exact vs sort —
               tests/test_crf.py::test_hash_neighbors_match_sort)

Stage deltas (dedup - embed, full - dedup) give per-phase ms. The faster
full variant is recorded to the ``lattice_neighbors`` tuning key (gated on
a compiled TPU measurement, like every recorded winner).

Usage: python scripts/exp_lattice.py [bench|parity]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MODE = sys.argv[1] if len(sys.argv) > 1 else "bench"

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rovinasemanticsegmentation_tpu.models.lattice import (  # noqa: E402
    _blur_neighbors_hash,
    _blur_neighbors_sort,
    _dedup_sorted,
    _embed_simplex,
    _pack_keys16,
)

N = int(os.environ.get("EL_N", 30_000))
D = 6
M_BUCKET = 1 << 15
K1, K2 = 4, 16


def build_parts(feats, m_bucket, neighbors):
    n, d = feats.shape
    d1 = d + 1
    s = n * d1
    spad = -(-s // 128) * 128
    keys, bary = _embed_simplex(feats)
    kflat = keys.reshape(s, d)
    packs = _pack_keys16(kflat, d)
    dd = _dedup_sorted(packs, kflat, bary, n, d, m_bucket, spad)
    if neighbors is None:
        return dd
    *head, m, uq, ucoord = dd
    b1, b2 = neighbors(uq, ucoord, m, m_bucket, d)
    return tuple(head) + (b1, b2, m)


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping TPU run", file=sys.stderr)
        raise SystemExit(3)

    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-3, 3, N), rng.uniform(0.5, 6, N)],
        axis=1,
    ).astype(np.float32)
    rgb = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    feats = jnp.asarray(
        np.concatenate([pts * 0.5, rgb * 4.0], axis=1)
    )  # bench-scale CRF features

    def slope(name, stage):
        times = {}
        for K in (K1, K2):
            @jax.jit
            def scanner(base):
                def body(c, i):
                    out = stage(feats + i.astype(jnp.float32) * 1e-5)
                    leaves = jax.tree_util.tree_leaves(out)
                    return c + sum(
                        jnp.sum(l.astype(jnp.float32)) for l in leaves
                    ), ()
                tot, _ = jax.lax.scan(
                    body, jnp.float32(0), base + jnp.arange(K)
                )
                return tot

            float(scanner(jnp.int32(0)))
            best = 1e9
            for rep in range(1, 3):
                t0 = time.perf_counter()
                float(scanner(jnp.int32(rep * 1000 + 1)))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        ms = (times[K2] - times[K1]) / (K2 - K1) * 1000
        print(f"{name:24s} {ms:8.3f} ms/iter  "
              f"(T{K1}={times[K1]*1e3:.0f} T{K2}={times[K2]*1e3:.0f})")
        return ms

    def safe(name, fn):
        try:
            return slope(name, fn)
        except Exception as e:  # noqa: BLE001 - report, keep measuring
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            return None

    embed_ms = safe("embed", lambda f: _embed_simplex(f))
    dedup_ms = safe("dedup (embed+sort)", lambda f: build_parts(f, M_BUCKET, None))
    sort_ms = safe(
        "full:sort", lambda f: build_parts(f, M_BUCKET, _blur_neighbors_sort)
    )
    hash_ms = safe(
        "full:hash", lambda f: build_parts(f, M_BUCKET, _blur_neighbors_hash)
    )
    if embed_ms and dedup_ms:
        print(f"  -> dedup phase        {dedup_ms - embed_ms:8.3f} ms")
    if dedup_ms and sort_ms:
        print(f"  -> neighbors (sort)   {sort_ms - dedup_ms:8.3f} ms")
    if dedup_ms and hash_ms:
        print(f"  -> neighbors (hash)   {hash_ms - dedup_ms:8.3f} ms")

    timed = {"sort": sort_ms, "hash": hash_ms}
    timed = {k: v for k, v in timed.items() if v is not None}
    if timed and jax.default_backend() == "tpu":
        from rovinasemanticsegmentation_tpu.utils import tuning

        winner = min(timed, key=timed.get)
        tuning.record(
            "lattice_neighbors", winner,
            {**{f"{k}_ms": round(v, 3) for k, v in timed.items()},
             "embed_ms": round(embed_ms, 3) if embed_ms else None,
             "dedup_ms": round(dedup_ms, 3) if dedup_ms else None,
             "script": "exp_lattice.py bench", "n_points": int(N)},
        )
        print(f"TUNING: lattice_neighbors={winner} "
              + " ".join(f"{k}={v:.2f}ms" for k, v in timed.items()))


if __name__ == "__main__":
    main()
