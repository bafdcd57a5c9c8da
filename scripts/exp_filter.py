"""Sub-phase slope profiling: lattice blur-neighbor resolution and the
transposed CRF filter, at bench map scale (30k pts, d=6, C=9).

Informs the two remaining map-path leads:
  (a) which part of the 23.6 ms neighbor phase dominates (main merge
      sort vs back-routing sort vs the n2 scatter inversion vs the
      cummax/match vector work);
  (b) whether lattice_filter_t is gather-latency-bound (bf16 won't help)
      or bandwidth-bound (bf16 halves the splat/slice traffic).

Slope rules per scripts/profile_slope.py: per-iteration perturbation,
one-dispatch scan loops, (T(K2)-T(K1))/(K2-K1), materialized results.
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

from rovinasemanticsegmentation_tpu.models.lattice import (
    _blur_neighbor_queries,
    _blur_neighbors_sort,
    _dedup_sorted,
    _embed_simplex,
    _pack_keys16,
    build_lattice_device,
    lattice_filter_t,
)

N = 30000
D = 6
C = 9
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
                return c + sum(
                    jnp.sum(l.astype(jnp.float32)) for l in leaves
                ), ()
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
    print(f"{name:34s} {ms:8.3f} ms/iter  "
          f"(T{K1}={times[K1]*1e3:.0f} T{K2}={times[K2]*1e3:.0f})")
    return ms


def neighbor_parts(uq, ucoord, m, m_bucket, d, upto):
    """Re-run _blur_neighbors_sort's pipeline, stopping after `upto`:
    1=main sort, 2=+cummax/match, 3=+back sort, 4=full (incl. n2)."""
    d1 = d + 1
    nk = (d + 1) // 2
    qpacked = _blur_neighbor_queries(ucoord, d, signs=(1,))
    keys_cat = [
        jnp.concatenate([uq[i]] + [qp[i] for qp in qpacked])
        for i in range(nk)
    ]
    slot_ids = jnp.arange(m_bucket, dtype=jnp.int32)
    payload = jnp.concatenate(
        [slot_ids] + [slot_ids + (k + 1) * m_bucket for k in range(d1)]
    )
    sorted_cat = jax.lax.sort(tuple(keys_cat) + (payload,), num_keys=nk + 1)
    if upto == 1:
        return sorted_cat
    spay = sorted_cat[nk]
    t_rows = spay.shape[0]
    iota_t = jnp.arange(t_rows, dtype=jnp.int32)
    last_u = jax.lax.cummax(jnp.where(spay < m_bucket, iota_t, -1))
    lu = jnp.maximum(last_u, 0)
    match = last_u >= 0
    for i in range(nk):
        match = match & (jnp.take(sorted_cat[i], lu) == sorted_cat[i])
    vmatch = jnp.take(spay, lu)
    match = match & (vmatch < m)
    result = jnp.where(match, vmatch, m_bucket)
    if upto == 2:
        return result
    back = jax.lax.sort((spay, result), num_keys=1)[1]
    if upto == 3:
        return back
    return _blur_neighbors_sort(uq, ucoord, m, m_bucket, d)


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping", file=sys.stderr)
        raise SystemExit(3)

    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-3, 3, N), rng.uniform(0.5, 6, N)],
        axis=1,
    ).astype(np.float32)
    rgb = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    feats = jnp.asarray(
        np.concatenate([pts * 0.5, rgb * 4.0], axis=1).astype(np.float32)
    )

    built = build_lattice_device(feats, m_bucket=M_BUCKET)
    (sorted_points, sorted_weights, seg_starts, seg_ends,
     offsets_t, barycentric_t, blur_n1, blur_n2, m) = built
    print("m =", int(m))

    # ---- build sub-phases ----------------------------------------------
    def st_embed_pack_dedup(i, f):
        keys, bary = _embed_simplex(f + i.astype(jnp.float32) * 1e-5)
        s = N * (D + 1)
        spad = -(-s // 128) * 128
        kflat = keys.reshape(s, D)
        packs = _pack_keys16(kflat, D)
        out = _dedup_sorted(packs, kflat, bary, N, D, M_BUCKET, spad)
        return out[:6]

    # Frozen dedup products for the neighbor sub-phases (perturb uq by the
    # iteration counter so the runtime cannot memoize).
    keys, bary = _embed_simplex(feats)
    s = N * (D + 1)
    spad = -(-s // 128) * 128
    kflat = keys.reshape(s, D)
    packs = _pack_keys16(kflat, D)
    dd = _dedup_sorted(packs, kflat, bary, N, D, M_BUCKET, spad)
    m_dev, uq, ucoord = dd[5], dd[6], dd[7]
    uq = [jnp.asarray(u) for u in uq]
    ucoord = [jnp.asarray(u) for u in ucoord]

    def mk_neigh(upto):
        def st(i, m_, *rest):
            nu = len(uq)
            uq_p = [rest[k] for k in range(nu)]
            uc_p = [rest[nu + k] for k in range(D)]
            # Perturb a coordinate stream without changing sort shape:
            # xor the low bit of the PAYLOAD domain only — keep keys
            # intact by instead adding i*0 (keys must stay valid);
            # memoization is defeated by the varying scalar operand m_.
            return neighbor_parts(uq_p, uc_p, m_ + i - i, M_BUCKET, D, upto)
        return st

    slope("dedup (embed+pack+sort)", st_embed_pack_dedup, feats)
    args = tuple(uq) + tuple(ucoord)
    slope("neigh 1: main merge sort", mk_neigh(1), m_dev, *args)
    slope("neigh 2: +cummax/match", mk_neigh(2), m_dev, *args)
    slope("neigh 3: +back sort", mk_neigh(3), m_dev, *args)
    slope("neigh 4: full (incl n2 inv)", mk_neigh(4), m_dev, *args)

    # ---- filter sub-phases ---------------------------------------------
    vals = jnp.asarray(rng.uniform(0, 1, (C, N)).astype(np.float32))

    def st_filter(i, v, *g):
        return lattice_filter_t(
            v + i.astype(jnp.float32) * 1e-6, *g, num_vertices=M_BUCKET
        )

    def st_filter_bf16(i, v, *g):
        (sp, sw, ss, se, ot, bt, b1, b2) = g
        out = lattice_filter_t(
            (v + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16),
            sp, sw.astype(jnp.bfloat16), ss, se, ot,
            bt.astype(jnp.bfloat16), b1, b2, num_vertices=M_BUCKET,
        )
        return out.astype(jnp.float32)

    from rovinasemanticsegmentation_tpu.models.lattice import (
        segment_sum_sorted_t,
    )

    def st_splat(i, v, sp, sw, ss, se):
        contrib = (
            jnp.take(v + i.astype(jnp.float32) * 1e-6, sp, axis=1)
            * sw[None, :]
        )
        return segment_sum_sorted_t(contrib, ss, se)

    def st_blur(i, verts, b1, b2):
        c = verts.shape[0]
        zero = jnp.zeros((c, 1), verts.dtype)
        vv = jnp.concatenate(
            [verts + i.astype(jnp.float32) * 1e-6, zero], axis=1
        )
        for j in range(D + 1):
            n1v = jnp.take(vv, b1[j], axis=1)
            n2v = jnp.take(vv, b2[j], axis=1)
            vv = jnp.concatenate(
                [vv[:, :M_BUCKET] + 0.5 * (n1v + n2v), zero], axis=1
            )
        return vv

    def st_slice(i, verts, ot, bt):
        vv = jnp.concatenate(
            [verts + i.astype(jnp.float32) * 1e-6,
             jnp.zeros((verts.shape[0], 1), verts.dtype)], axis=1
        )
        gathered = jnp.take(vv, ot, axis=1)
        return (gathered * bt[None, :, :]).sum(axis=1)

    geo = (sorted_points, sorted_weights, seg_starts, seg_ends,
           offsets_t, barycentric_t, blur_n1, blur_n2)
    verts0 = jnp.asarray(rng.uniform(0, 1, (C, M_BUCKET)).astype(np.float32))

    f32 = slope("filter full f32", st_filter, vals, *geo)
    bf16 = slope("filter full bf16 vals", st_filter_bf16, vals, *geo)
    slope("filter: splat", st_splat, vals, sorted_points, sorted_weights,
          seg_starts, seg_ends)
    slope("filter: blur (7 passes)", st_blur, verts0, blur_n1, blur_n2)
    slope("filter: slice", st_slice, verts0, offsets_t, barycentric_t)
    print(f"bf16/f32 filter ratio: {bf16 / max(f32, 1e-9):.2f}")


if __name__ == "__main__":
    main()
