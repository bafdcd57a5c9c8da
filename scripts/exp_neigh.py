"""Blur-neighbor match-step variants: gather-based vs cummax-only.

exp_filter.py (round 5) localized the device lattice build's cost: of the
~23 ms neighbor phase, ~21.5 ms is the cummax/match step — it issues FOUR
dynamic row-gathers over the ~262k-row merged stream (3 key words + the
payload at the predecessor-unique index). The merge sort itself is free.

Variant B removes every gather using two invariants of the merged stream:
  (1) the payload is the FINAL sort key, so within an equal-key run the
      unique row (payload < m_bucket) sorts FIRST, and each run holds at
      most one unique row (unique keys are deduped);
  (2) unique slot ids ascend with key order (they are assigned in sorted
      key order), so a cummax of masked slot ids carries the slot of the
      most recent unique row.
Match test: "the most recent unique row lies within my run", i.e.
cummax(unique row index) >= cummax(run-start index), where run starts are
adjacent-row key inequality (contiguous shifts, no gathers). Three
cummaxes + shifts replace one cummax + four gathers.

Slope rules per scripts/profile_slope.py (perturb per iteration, scan
loops, materialize, best-of-2).
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
)

N = int(os.environ.get("EXP_N", 30000))
D = 6
M_BUCKET = 1 << int(os.environ.get("EXP_MB_LOG2", 15))
K1, K2 = 4, 16


def match_gather(sorted_cat, nk, m, m_bucket):
    """Current production match step (one cummax + four row-gathers)."""
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
    return jnp.where(match, vmatch, m_bucket)


def match_cummax(sorted_cat, nk, m, m_bucket):
    """Gather-free match step (three cummaxes + adjacent shifts)."""
    spay = sorted_cat[nk]
    t_rows = spay.shape[0]
    iota_t = jnp.arange(t_rows, dtype=jnp.int32)
    is_u = spay < m_bucket
    neq_prev = jnp.zeros(t_rows, bool).at[0].set(True)
    for i in range(nk):
        k = sorted_cat[i]
        neq_prev = neq_prev | jnp.concatenate(
            [jnp.ones((1,), bool), k[1:] != k[:-1]]
        )
    rs_idx = jax.lax.cummax(jnp.where(neq_prev, iota_t, -1))
    u_idx = jax.lax.cummax(jnp.where(is_u, iota_t, -1))
    u_slot = jax.lax.cummax(jnp.where(is_u, spay, -1))
    match = (u_idx >= rs_idx) & (u_slot >= 0) & (u_slot < m)
    return jnp.where(match, u_slot, m_bucket)


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

    keys, bary = _embed_simplex(feats)
    s = N * (D + 1)
    spad = -(-s // 128) * 128
    kflat = keys.reshape(s, D)
    packs = _pack_keys16(kflat, D)
    dd = _dedup_sorted(packs, kflat, bary, N, D, M_BUCKET, spad)
    m_dev, uq, ucoord = dd[5], dd[6], dd[7]
    m = int(m_dev)
    print("m =", m)
    uq = [jnp.asarray(u) for u in uq]
    ucoord = [jnp.asarray(u) for u in ucoord]

    d1 = D + 1
    nk = (D + 1) // 2
    qpacked = _blur_neighbor_queries(ucoord, D, signs=(1,))
    keys_cat = [
        jnp.concatenate([uq[i]] + [qp[i] for qp in qpacked])
        for i in range(nk)
    ]
    slot_ids = jnp.arange(M_BUCKET, dtype=jnp.int32)
    payload = jnp.concatenate(
        [slot_ids] + [slot_ids + (k + 1) * M_BUCKET for k in range(d1)]
    )
    sorted_cat = jax.lax.sort(tuple(keys_cat) + (payload,), num_keys=nk + 1)

    # ---- parity: both match variants agree row-for-row -------------------
    a = np.asarray(match_gather(sorted_cat, nk, m_dev, M_BUCKET))
    b = np.asarray(match_cummax(sorted_cat, nk, m_dev, M_BUCKET))
    diff = int((a != b).sum())
    print(f"parity gather-vs-cummax: {diff} mismatching rows of {a.shape[0]}")
    assert diff == 0
    if "--parity-only" in sys.argv:
        return

    # ---- slopes -----------------------------------------------------------
    sc = tuple(jnp.asarray(x) for x in sorted_cat)

    def st_gather(i, m_, *scat):
        return match_gather(scat, nk, m_ + i - i, M_BUCKET)

    def st_cummax(i, m_, *scat):
        return match_cummax(scat, nk, m_ + i - i, M_BUCKET)

    slope("match: gather (current)", st_gather, m_dev, *sc)
    slope("match: cummax-only", st_cummax, m_dev, *sc)

    # Full build comparison rides the production path via env flag once
    # landed; here compare full neighbor resolution inline.
    def full_neigh(matchfn):
        def st(i, m_, *rest):
            nu = len(uq)
            uq_p = [rest[k] for k in range(nu)]
            uc_p = [rest[nu + k] for k in range(D)]
            qp = _blur_neighbor_queries(uc_p, D, signs=(1,))
            kc = [
                jnp.concatenate([uq_p[i2]] + [q[i2] for q in qp])
                for i2 in range(nk)
            ]
            srt = jax.lax.sort(tuple(kc) + (payload,), num_keys=nk + 1)
            res = matchfn(srt, nk, m_ + i - i, M_BUCKET)
            back = jax.lax.sort((srt[nk], res), num_keys=1)[1]
            return back
        return st

    args = tuple(uq) + tuple(ucoord)
    slope("neigh full: gather", full_neigh(match_gather), m_dev, *args)
    slope("neigh full: cummax", full_neigh(match_cummax), m_dev, *args)


if __name__ == "__main__":
    main()
