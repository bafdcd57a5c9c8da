"""Per-op breakdown of the device training level step (VERDICT r4 item 3).

The fused forest growth (grow_forest_device) measured 397 s warm for
2 trees x 100k pts x 366 feats (C++ 8-thread reference: 12.8 s,
/root/reference/third-party/libforest/src/learning.cpp:1046). This
isolates each building block at the bench shape (ns=100k, F=4096 frontier
bucket, K=20 slots, C=9, L=2) so the redesign attacks the real cost:

  sort        one lax.sort (3 operands, 2 keys) over ns        [per slot]
  search      split_search_step (sort + prefix + scan + 2x searchsorted)
  nostats     node_stats_step (1 sort + prefix + 2x searchsorted) [per level]
  gatherK     [ns, K] take_along_axis value gather               [per level]
  topk        jax.random.uniform([F, D]) + top_k(K) rng          [per level]
  level       multi_slot_split_search (K slots scanned)          [per level]
  scat1       scatter-add ns rows -> [F*C*B] f32 (binned hist, 1 slot)
  sweep1      binned cumsum+entropy+argmin over [F, C, B]        [per slot]
  bslot       _binned_slot_search (scat1 + sweep1)               [per slot]
  blevel      multi_slot_split_search_binned (K slots)           [per level]
  binstats    node_stats_scatter                                 [per level]

Timing: slope method (ROADMAP benchmarking rules — the axon runtime
memoizes same-input executions and per-dispatch wall time is meaningless
through the tunnel): each op runs K=4 and K=16 times inside one jitted
lax.scan with the inputs perturbed per iteration; cost = (t16 - t4)/12,
best of 2.
"""

import json
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
    _binned_slot_search,
    multi_slot_split_search,
    multi_slot_split_search_binned,
    node_stats_scatter,
    node_stats_step,
    split_search_step,
)
from rovinasemanticsegmentation_tpu.utils import tpu_lock  # noqa: E402

NS = int(os.environ.get("PT_NS", 100_000))
D = 366
C = 9
L = 2
F = int(os.environ.get("PT_F", 4096))
K = 20
B = int(os.environ.get("PT_B", 256))


def slope(name, fn, results):
    """fn(i) -> array(s); per-iteration cost via the scan-slope method."""
    times = {}
    for reps in (4, 16):

        @jax.jit
        def scanner(b):
            def body(c, i):
                out = fn(b + i)
                leaves = jax.tree_util.tree_leaves(out)
                s = sum(jnp.sum(x).astype(jnp.float32) for x in leaves)
                return c + s, ()

            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return tot

        float(scanner(jnp.int32(0)))  # compile
        best = 1e9
        for rep in range(1, 3):
            t0 = time.perf_counter()
            float(scanner(jnp.int32(rep * 100 + 1)))
            best = min(best, time.perf_counter() - t0)
        times[reps] = best
    ms = (times[16] - times[4]) / 12 * 1000
    print(f"{name:10s} {ms:9.2f} ms/iter", flush=True)
    results[name] = round(ms, 3)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((NS, D), np.float32))
    xb = jnp.asarray(rng.integers(0, B, (NS, D)).astype(np.int32))
    bnd = jnp.asarray(np.sort(rng.random((D, B - 1))).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, (NS, L)), jnp.int32)
    cw = jnp.ones((C,), jnp.float32)
    seg0 = jnp.asarray(rng.integers(0, F, NS).astype(np.int32))
    vals0 = jnp.asarray(rng.random(NS, dtype=np.float32))
    cls0 = jnp.asarray(rng.integers(0, C, NS).astype(np.int32))
    feats0 = jnp.asarray(rng.choice(D, size=(F, K), replace=True).astype(np.int32))
    bins0 = jnp.asarray(rng.integers(0, B, NS).astype(np.int32))
    jax.block_until_ready([x, xb, bnd, labels, seg0, vals0, cls0, feats0, bins0])

    # Cheap per-iteration perturbations (rotations keep distributions).
    def seg_i(i):
        return (seg0 + i) % F

    def cls_i(i):
        return (cls0 + i) % C

    def vals_i(i):
        return vals0 + 1e-7 * i.astype(jnp.float32)

    def bins_i(i):
        return (bins0 + i) % B

    results = {}
    slope("sort", lambda i: jax.lax.sort(
        (seg_i(i), vals_i(i), cls_i(i)), num_keys=2), results)
    slope("search", lambda i: split_search_step(
        vals_i(i), seg_i(i), cls_i(i), cw, F, C), results)
    slope("nostats", lambda i: node_stats_step(
        seg_i(i), labels, F, C, L), results)
    slope("gatherK", lambda i: jnp.take_along_axis(
        x, jnp.take(feats0, jnp.minimum(seg_i(i), F - 1), axis=0), axis=1,
    ), results)

    def topk(i):
        pri = jax.random.uniform(jax.random.PRNGKey(i.astype(jnp.uint32)), (F, D))
        _, f = jax.lax.top_k(pri, K)
        return f

    slope("topk", topk, results)
    slope("level", lambda i: multi_slot_split_search(
        x, feats0, seg_i(i), seg_i(i), cls_i(i), cw, F, C), results)

    def scat1(i):
        key = (jnp.minimum(seg_i(i), F - 1) * C + cls_i(i)) * B + bins_i(i)
        return jnp.zeros((F * C * B,), jnp.float32).at[key].add(
            1.0, mode="drop")

    slope("scat1", scat1, results)

    hist0 = jnp.asarray(rng.integers(0, 5, (F, C, B)).astype(np.float32))

    def sweep1(i):
        hist = hist0 + (i % 2).astype(jnp.float32)
        left = jnp.cumsum(hist, axis=2)[:, :, : B - 1]
        tot = hist.sum(axis=2)
        right = tot[:, :, None] - left
        lm = left.sum(axis=1)
        rm = right.sum(axis=1)

        def ent(h):
            m = h.sum(axis=1)
            t = jnp.where(h > 0, -h * jnp.log2(jnp.maximum(h, 1e-30)), 0.0)
            mt = jnp.where(m > 0, m * jnp.log2(jnp.maximum(m, 1e-30)), 0.0)
            return t.sum(axis=1) + mt

        obj = jnp.where((lm > 0) & (rm > 0), ent(left) + ent(right), jnp.inf)
        bb = jnp.argmin(obj, axis=1)
        return bb, jnp.take_along_axis(obj, bb[:, None], axis=1)[:, 0]

    slope("sweep1", sweep1, results)
    slope("bslot", lambda i: _binned_slot_search(
        bins_i(i), seg_i(i), cls_i(i), cw, F, C, B), results)
    slope("blevel", lambda i: multi_slot_split_search_binned(
        xb, bnd, feats0, seg_i(i), seg_i(i), cls_i(i), cw, F, C, B),
        results)
    slope("binstats", lambda i: node_stats_scatter(
        seg_i(i), labels, F, C, L), results)

    print(json.dumps({"ns": NS, "F": F, "B": B, "ms": results}))


if __name__ == "__main__":
    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping", file=sys.stderr)
        sys.exit(0)
    main()
