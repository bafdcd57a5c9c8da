"""Descent-kernel instruction-mix experiments (round 3).

Variants of the packing/x-lookup stages of ops/forest_pallas.py's
_descent_kernel, aimed at its dominant cost: the [tile, 128]-domain
dynamic gathers (2 diag + 3 feature-chunk per level, ~8 of 11.9 ms).

  A (baseline)   : current kernel via find_leaves_pallas.
  B (transpose)  : replace the diag gathers with an MXU identity-matmul
                   transpose of the packed words (2 features x 9 bits =
                   18-bit ints, exact in f32 at HIGHEST precision) +
                   lane broadcasts.
  C (chunk skip) : skip a feature-chunk gather when no point in the tile
                   needs that chunk this level (lax.cond on a reduction),
                   with usage-frequency feature reordering to concentrate
                   lookups in chunk 0.
  D = B + C.

Usage:
  python scripts/exp_descent.py parity   # CPU interpret-mode parity
  python scripts/exp_descent.py bench    # TPU slope timings (A vs B/C/D)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "parity"

if MODE == "parity":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

if MODE == "parity":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rovinasemanticsegmentation_tpu.ops.forest_pallas import (
    LANES,
    build_level_major,
    find_leaves_pallas,
)
from rovinasemanticsegmentation_tpu.models.forest import load_forest

# ----------------------------------------------------------------------
# Variant kernel
# ----------------------------------------------------------------------


def _descent_kernel_v(
    off_ref, nch_ref, feats_ref, meta_ref, thr_ref, out_ref,
    *, num_trees, num_levels, feat_bits, feat_chunks, tile,
    transpose_pack: bool, chunk_skip: bool,
):
    fmask = (1 << feat_bits) - 1
    s_rows = tile // LANES
    lane_of_p = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 0) % LANES
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    eye = jnp.eye(LANES, dtype=jnp.float32)

    def level_cond(state):
        l, active, _ = state
        return (l < num_levels) & (active > 0)

    max_chunk_idx = meta_ref.shape[1] - 1

    def level_body(state):
        l, _, nodes = state
        offs = [off_ref[t, l] for t in range(num_trees)]
        locals_ = [nodes[t] - offs[t] * LANES for t in range(num_trees)]
        max_chunks = nch_ref[0, l]
        for t in range(1, num_trees):
            max_chunks = jnp.maximum(max_chunks, nch_ref[t, l])

        def chunk_body(c, carry):
            out = list(carry)
            base = c * LANES
            for t in range(num_trees):
                local = locals_[t]
                in_chunk = (local >= base) & (local < base + LANES)
                r = jnp.clip(local - base, 0, LANES - 1)
                row = jnp.minimum(offs[t] + c, max_chunk_idx)
                chunk_m = jnp.broadcast_to(
                    meta_ref[t, row, :].reshape(1, LANES), (s_rows, LANES)
                )
                chunk_t = jnp.broadcast_to(
                    thr_ref[t, row, :].reshape(1, LANES), (s_rows, LANES)
                )
                g_m = jnp.take_along_axis(chunk_m, r, axis=1)
                g_t = jnp.take_along_axis(chunk_t, r, axis=1)
                out[2 * t] = jnp.where(in_chunk, g_m, out[2 * t])
                out[2 * t + 1] = jnp.where(in_chunk, g_t, out[2 * t + 1])
            return tuple(out)

        init = []
        for _ in range(num_trees):
            init.append(jnp.zeros((s_rows, LANES), jnp.int32))
            init.append(jnp.zeros((s_rows, LANES), jnp.float32))
        swept = jax.lax.fori_loop(0, max_chunks, chunk_body, tuple(init))
        metas = [swept[2 * t] for t in range(num_trees)]
        thrs = [swept[2 * t + 1] for t in range(num_trees)]

        # Per-tree feature ids; under chunk_skip, settled points (leaf
        # records, f = 0) are routed to the sentinel chunk fmask // 128 so
        # they never force a chunk's gather (their x is ignored anyway).
        if chunk_skip:
            fids = [
                jnp.where(
                    (metas[t] >> feat_bits) == 0, fmask, metas[t] & fmask
                )
                for t in range(num_trees)
            ]
        else:
            fids = [metas[t] & fmask for t in range(num_trees)]

        if transpose_pack:
            # 2 features per word: 2 * feat_bits <= 23 keeps the word an
            # exactly-representable f32 int; transpose [S, 128] -> [128, S]
            # rides the MXU (identity matmul, HIGHEST precision = exact for
            # f32 inputs; one nonzero per row so no accumulation).
            per_word = max(1, 23 // feat_bits)
            groups = [
                list(range(g, min(g + per_word, num_trees)))
                for g in range(0, num_trees, per_word)
            ]
            packed = jnp.zeros((tile, LANES), jnp.int32)
            for grp in groups:
                word = fids[grp[0]]
                for k, t in enumerate(grp[1:], start=1):
                    word = word | (fids[t] << (k * feat_bits))
                wt = jax.lax.dot_general(
                    eye, word.astype(jnp.float32),
                    (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                )  # [128, S]: wt[l, s] = word of point s*128+l
                rep_blocks = []
                for s in range(s_rows):
                    # Static slice: Mosaic TC has no dynamic_slice lowering.
                    col = wt[:, s : s + 1]
                    rep_blocks.append(
                        jnp.broadcast_to(col, (LANES, LANES)).astype(jnp.int32)
                    )
                rep = jnp.concatenate(rep_blocks, axis=0)  # [tile, 128]
                for k, t in enumerate(grp):
                    packed = jnp.where(
                        lane_id == t, (rep >> (k * feat_bits)) & fmask, packed
                    )
        else:
            per_word = max(1, 31 // feat_bits)
            groups = [
                list(range(g, min(g + per_word, num_trees)))
                for g in range(0, num_trees, per_word)
            ]
            g_stacks = []
            for grp in groups:
                word = fids[grp[0]]
                for k, t in enumerate(grp[1:], start=1):
                    word = word | (fids[t] << (k * feat_bits))
                g_stacks.append(word)
            f_stack = jnp.concatenate(g_stacks, axis=1)
            ng = len(groups)
            f_rows = jnp.broadcast_to(
                f_stack[:, None, :], (s_rows, LANES, ng * LANES)
            ).reshape(tile, ng * LANES)
            packed = jnp.zeros((tile, LANES), jnp.int32)
            for gi, grp in enumerate(groups):
                rep = jnp.take_along_axis(
                    f_rows[:, gi * LANES : (gi + 1) * LANES], lane_of_p, axis=1
                )
                for k, t in enumerate(grp):
                    packed = jnp.where(
                        lane_id == t, (rep >> (k * feat_bits)) & fmask, packed
                    )

        f_chunk = packed // LANES
        f_lane = packed - f_chunk * LANES
        x_pack = jnp.zeros((tile, LANES), jnp.float32)
        # Mask inactive lanes (>= num_trees) to chunk -1 so they never
        # force a chunk's gather under chunk_skip.
        f_chunk_m = jnp.where(lane_id < num_trees, f_chunk, -1)
        for fc in range(feat_chunks):
            chunk = feats_ref[:, pl.ds(fc * LANES, LANES)]
            if chunk_skip:
                need = jnp.any(f_chunk_m == fc)
                xc = jax.lax.cond(
                    need,
                    lambda ch=chunk, fl=f_lane: jnp.take_along_axis(
                        ch, fl, axis=1
                    ),
                    lambda: jnp.zeros((tile, LANES), jnp.float32),
                )
            else:
                xc = jnp.take_along_axis(chunk, f_lane, axis=1)
            x_pack = jnp.where(f_chunk == fc, xc, x_pack)

        new_nodes = []
        moving = jnp.zeros((s_rows, LANES), jnp.int32)
        for t in range(num_trees):
            x = x_pack[:, t : t + 1].reshape(s_rows, LANES)
            lc = metas[t] >> feat_bits
            nxt = lc + (x >= thrs[t]).astype(jnp.int32)
            moving = moving | (lc != 0).astype(jnp.int32)
            new_nodes.append(jnp.where(lc == 0, nodes[t], nxt))
        return (l + 1, jnp.sum(moving), tuple(new_nodes))

    nodes = tuple(
        jnp.zeros((s_rows, LANES), jnp.int32) for _ in range(num_trees)
    )
    _, _, nodes = jax.lax.while_loop(
        level_cond, level_body, (jnp.int32(0), jnp.int32(1), nodes)
    )
    for t in range(num_trees):
        out_ref[:, pl.ds(t * LANES, LANES)] = nodes[t]


def find_leaves_v(
    features, meta, thresholds, level_offsets, level_chunks,
    num_levels, feat_bits, tile=1024, interpret=False,
    transpose_pack=False, chunk_skip=False,
):
    interpret = interpret or jax.default_backend() != "tpu"
    p, d = features.shape
    t_count = meta.shape[0]
    feat_chunks = -(-d // LANES)
    d_pad = feat_chunks * LANES
    p_pad = -(-p // tile) * tile
    feats = jnp.pad(features, ((0, p_pad - p), (0, d_pad - d)))
    np_nodes = meta.shape[1]
    meta = meta.reshape(t_count, np_nodes // LANES, LANES)
    thresholds = thresholds.reshape(t_count, np_nodes // LANES, LANES)

    out = pl.pallas_call(
        partial(
            _descent_kernel_v,
            num_trees=t_count, num_levels=num_levels, feat_bits=feat_bits,
            feat_chunks=feat_chunks, tile=tile,
            transpose_pack=transpose_pack, chunk_skip=chunk_skip,
        ),
        grid=(p_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile // LANES, t_count * LANES), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((p_pad // LANES, t_count * LANES), jnp.int32),
        interpret=interpret,
    )(level_offsets, level_chunks, feats, meta, thresholds)

    leaves = (
        out.reshape(p_pad // LANES, t_count, LANES)
        .transpose(0, 2, 1)
        .reshape(p_pad, t_count)
    )
    return leaves[:p]


# ----------------------------------------------------------------------
# Usage-frequency feature reordering (for chunk_skip)
# ----------------------------------------------------------------------


def usage_permutation(lm, d):
    """perm such that features sorted by split-usage count (desc); returns
    (perm [D], remap [D]) with remap[old_feat] = new position."""
    fmask = (1 << lm.feat_bits) - 1
    feats = lm.meta & fmask
    internal = (lm.meta >> lm.feat_bits) != 0
    counts = np.bincount(feats[internal].ravel(), minlength=d)[:d]
    perm = np.argsort(-counts, kind="stable")
    remap = np.empty_like(perm)
    remap[perm] = np.arange(len(perm))
    return perm, remap


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if MODE == "bench" and not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping TPU bench",
              file=sys.stderr)
        raise SystemExit(3)
    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "resources",
        "bench_forest.dat",
    )
    forest = load_forest(fixture, class_counts=[8, 9])
    lm = build_level_major(forest)
    meta = jnp.asarray(lm.meta)
    thr = jnp.asarray(lm.thresholds)
    off = jnp.asarray(lm.level_offsets)
    nch = jnp.asarray(lm.level_chunks)

    rng = np.random.default_rng(0)
    n = 76800 if MODE == "bench" else 4096
    d = 366
    x = rng.normal(size=(n, d)).astype(np.float32) * 2.0
    xd = jnp.asarray(x)

    base = np.asarray(
        find_leaves_pallas(xd, meta, thr, off, nch, lm.num_levels, lm.feat_bits)
    )

    perm, remap = usage_permutation(lm, d)
    fmask = (1 << lm.feat_bits) - 1
    meta_r = (remap[lm.meta & fmask] | (lm.meta & ~np.int64(fmask))).astype(
        np.int32
    )
    meta_r = jnp.asarray(meta_r)
    xp = jnp.asarray(x[:, perm])

    variants = {
        "B transpose": dict(transpose_pack=True, chunk_skip=False),
        "C chunkskip": dict(transpose_pack=False, chunk_skip=True),
        "D both": dict(transpose_pack=True, chunk_skip=True),
    }
    for name, kw in variants.items():
        use_perm = kw["chunk_skip"]
        try:
            res = np.asarray(
                find_leaves_v(
                    xp if use_perm else xd,
                    meta_r if use_perm else meta,
                    thr, off, nch, lm.num_levels, lm.feat_bits, **kw,
                )
            )
        except Exception as e:
            print(f"{name}: COMPILE/RUN FAILED {type(e).__name__}: {e}")
            continue
        ok = np.array_equal(res, base)
        print(f"{name}: {'PARITY OK' if ok else 'MISMATCH ' + str((res != base).mean())}")
        if not ok and MODE == "parity":
            bad = np.argwhere(res != base)[:5]
            print("  first mismatches:", bad.tolist())

    if MODE != "bench":
        return

    # Slope timings.
    def slope(name, fn):
        times = {}
        for K in (4, 16):
            @jax.jit
            def scanner(b):
                def body(c, i):
                    leaves = fn(xd_pert(b + i))
                    return c + jnp.sum(leaves), ()
                tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(K))
                return tot

            float(scanner(jnp.int32(0)))
            best = 1e9
            for rep in range(1, 3):
                t0 = time.perf_counter()
                float(scanner(jnp.int32(rep * 100 + 1)))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        ms = (times[16] - times[4]) / 12 * 1000
        print(f"{name:16s} {ms:7.2f} ms/iter")
        return ms

    def xd_pert(i):
        return xd + i.astype(jnp.float32) * 1e-6

    def xp_pert(i):
        return xp + i.astype(jnp.float32) * 1e-6

    def safe(fn, *a):
        try:
            return fn(*a)
        except Exception as e:  # one variant's Mosaic failure mustn't
            print(f"FAILED {a[0] if a else ''}: {type(e).__name__}: {e}")
            return None

    a_ms = safe(slope, "A baseline", lambda f: find_leaves_pallas(
        f, meta, thr, off, nch, lm.num_levels, lm.feat_bits))
    safe(slope, "B transpose", lambda f: find_leaves_v(
        f, meta, thr, off, nch, lm.num_levels, lm.feat_bits,
        transpose_pack=True))

    # Record the production-default winner (utils/tuning.py): compare the
    # PRODUCTION kernel's transpose_pack path (not the find_leaves_v
    # experiment wrapper) against the baseline, gate on compiled parity,
    # and write TUNING.json so the official bench runs the winner even if
    # the tunnel dies between this measurement and the capture.
    def _prod_transpose(f):
        return find_leaves_pallas(
            f, meta, thr, off, nch, lm.num_levels, lm.feat_bits,
            transpose_pack=True,
        )

    bp_ms = None
    try:
        prod_ok = np.array_equal(np.asarray(_prod_transpose(xd)), base)
        print(f"B transpose (production kernel): "
              f"{'PARITY OK' if prod_ok else 'MISMATCH'}")
        if prod_ok:
            bp_ms = safe(slope, "B prod", _prod_transpose)
    except Exception as e:
        print(f"B production-path check failed: {type(e).__name__}: {e}")
    if a_ms is not None and bp_ms is not None and jax.default_backend() == "tpu":
        from rovinasemanticsegmentation_tpu.utils import tuning

        tuning.record(
            "descent_transpose",
            bool(bp_ms < a_ms),
            {"baseline_ms": round(a_ms, 3), "transpose_ms": round(bp_ms, 3),
             "script": "exp_descent.py bench", "n_points": int(n)},
        )
        print(f"TUNING: descent_transpose={bp_ms < a_ms} "
              f"(A {a_ms:.2f} vs B {bp_ms:.2f} ms)")
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if tpu_lock.deadline_expired(margin_s=120):
        print("TPUQ_DEADLINE_S reached; skipping C/D variants", file=sys.stderr)
        return

    # C/D use permuted features.
    def slope_p(name, fn):
        times = {}
        for K in (4, 16):
            @jax.jit
            def scanner(b):
                def body(c, i):
                    leaves = fn(xp_pert(b + i))
                    return c + jnp.sum(leaves), ()
                tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(K))
                return tot

            float(scanner(jnp.int32(0)))
            best = 1e9
            for rep in range(1, 3):
                t0 = time.perf_counter()
                float(scanner(jnp.int32(rep * 100 + 1)))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        ms = (times[16] - times[4]) / 12 * 1000
        print(f"{name:16s} {ms:7.2f} ms/iter")

    safe(slope_p, "C chunkskip", lambda f: find_leaves_v(
        f, meta_r, thr, off, nch, lm.num_levels, lm.feat_bits,
        chunk_skip=True))
    safe(slope_p, "D both", lambda f: find_leaves_v(
        f, meta_r, thr, off, nch, lm.num_levels, lm.feat_bits,
        transpose_pack=True, chunk_skip=True))


if __name__ == "__main__":
    main()
