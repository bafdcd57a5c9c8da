"""Vertex-sharded permutohedral CRF: the real long-context component.

``parallel/sharded_crf.py`` proves point sharding but replicates the vertex
table — one ``psum([M+1, C])`` per mean-field iteration, replicated blur, no
per-device memory scaling. This module shards BOTH axes of the problem the
way ring attention shards KV blocks (SURVEY.md §5):

- points are ordered by their corner-0 lattice vertex (spatially clustered)
  and sharded in contiguous blocks, so each shard's points occupy a compact
  region of the lattice;
- vertices are owned by the shard that contributes most of their splat mass
  (majority assignment over the host-known routing), renumbered
  owner-contiguous — per-device vertex state is ``[C, M/D + halo]``, not
  ``[C, M]``;
- the splat reduces locally first (sorted-segment prefix sums, the same
  machinery as ``lattice_filter_t``), then exchanges only per-destination
  PARTIALS for boundary vertices (one small all_gather per filter);
- each of the d+1 sequential blur passes (``permutohedral.cpp:476-527``)
  exchanges only the HALO vertices other shards actually reference (host
  precomputes publish/subscribe lists) instead of the whole table;
- the slice is local up to the same halo.

Comms per filter: 1 boundary all_gather + (d+2) halo all_gathers, each of
size ``D * bucket`` where the buckets are the measured boundary/halo counts
(surface terms), vs the old design's ``(M+1) * C`` psum (a volume term).
The plan reports both so callers can log the ratio.

Everything is host-planned per map (the lattice is host-built for this
path), bucketed to powers of two for compile stability, and executed as one
``shard_map`` with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.crf import exp_and_normalize
from ..models.lattice import PermutohedralLattice, segment_sum_sorted_t

LANES = 128


def _bucket(n: int, minimum: int = LANES) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass
class ShardedLatticePlan:
    """Host-computed routing for one (lattice, n_shards) pair.

    Every array carries a leading shard axis D so ``shard_map`` hands each
    device exactly its slice. Indices marked "pool" address the per-device
    vertex pool ``[0, m_loc) local | [m_loc, m_loc+h) halo | m_loc+h zero``.
    """

    n_shards: int
    d1: int
    n: int  # real point count
    n_loc: int  # padded points per shard
    m: int  # real vertex count (pre-bucketing)
    m_loc: int  # padded local vertices per shard
    point_order: np.ndarray  # [N] original index of sorted-position i
    # Local splat stream (sorted by dest local vertex).
    src_l: np.ndarray  # [D, S_l] local point index
    w_l: np.ndarray  # [D, S_l]
    seg_l: np.ndarray  # [D, 2, m_loc] start/end rows into the stream
    # Boundary splat stream (sorted by dest global id), reduced to one
    # partial per distinct remote destination before the exchange.
    src_b: np.ndarray  # [D, S_b]
    w_b: np.ndarray  # [D, S_b]
    seg_b: np.ndarray  # [D, 2, B] start/end per distinct remote dest
    # Receiver side: indices into the flattened [D*B] exchanged partials
    # (D*B = zero pad), sorted by local dest, with per-vertex ranges.
    recv_idx: np.ndarray  # [D, R]
    seg_r: np.ndarray  # [D, 2, m_loc]
    # Halo machinery: each shard publishes pub_idx of its locals; each
    # shard reads its halo from the flattened [D*U] publish pool.
    pub_idx: np.ndarray  # [D, U] local vertex ids to publish
    halo_idx: np.ndarray  # [D, H] indices into the publish pool
    # Blur + slice tables in pool coordinates.
    blur_n1: np.ndarray  # [D, d1, m_loc]
    blur_n2: np.ndarray  # [D, d1, m_loc]
    offsets: np.ndarray  # [D, d1, n_loc]
    barycentric: np.ndarray  # [D, d1, n_loc]

    @property
    def comms_per_filter(self) -> int:
        """Exchanged values per filter application (per channel)."""
        d = self.n_shards
        return d * self.seg_b.shape[2] + (self.d1 + 1) * d * self.pub_idx.shape[1]

    @property
    def replicated_comms_per_filter(self) -> int:
        """What the replicated-vertex design would move (per channel).

        Uses the REAL vertex count M (the replicated psum moves [C, M+1]
        per filter), not ``d * m_loc`` — the pow2 bucket of the max
        per-shard ownership can overstate M+1 by 2x or more and would skew
        the halo-vs-psum comparison.
        """
        return self.n_shards * (self.m + 1)


def plan_sharded_lattice(
    lattice: PermutohedralLattice, n_shards: int
) -> ShardedLatticePlan:
    n, d1 = lattice.offsets.shape
    m = lattice.num_vertices
    d = n_shards

    # ------------------------------------------------------------------
    # Points: order by corner-0 vertex for spatial locality, contiguous
    # blocks per shard.
    order = np.argsort(lattice.offsets[:, 0], kind="stable").astype(np.int64)
    n_loc = _bucket(-(-n // d))
    shard_of_point = np.minimum(np.arange(d * n_loc) // n_loc, d - 1)

    # offsets/barycentric in sorted-point order, padded with zero-weight
    # rows pointing at the (future) zero slot.
    offs_s = np.full((d * n_loc, d1), m, np.int64)
    bary_s = np.zeros((d * n_loc, d1), np.float32)
    offs_s[:n] = lattice.offsets[order]
    bary_s[:n] = lattice.barycentric[order]

    # ------------------------------------------------------------------
    # Vertex ownership: majority splat mass (count of contributions).
    counts = np.zeros((m, d), np.int64)
    for j in range(d1):
        np.add.at(counts, (offs_s[:n, j], shard_of_point[:n]), 1)
    owner = np.argmax(counts, axis=1).astype(np.int64)

    m_per = np.bincount(owner, minlength=d)
    m_loc = _bucket(int(m_per.max()))
    local_id = np.zeros(m, np.int64)
    for s in range(d):
        mine = np.flatnonzero(owner == s)
        local_id[mine] = np.arange(len(mine))
    gid = owner * m_loc + local_id  # owner-contiguous renumbering

    # ------------------------------------------------------------------
    # Splat streams per shard.
    src_l_all, w_l_all, seg_l_all = [], [], []
    src_b_all, w_b_all, seg_b_all = [], [], []
    partial_dest = []  # per shard: [B_s] global ids of its outgoing partials
    for s in range(d):
        rows = np.arange(s * n_loc, min((s + 1) * n_loc, d * n_loc))
        rows = rows[rows < d * n_loc]
        pt_local = np.tile(np.arange(n_loc)[:, None], (1, d1)).reshape(-1)
        dest = offs_s[rows].reshape(-1)
        w = bary_s[rows].reshape(-1)
        realc = dest < m  # padded points carry dest == m
        pt_local, dest, w = pt_local[realc], dest[realc], w[realc]
        own = owner[dest] == s

        # Local: sort by local dest id.
        dl, pl, wl = local_id[dest[own]], pt_local[own], w[own]
        perm = np.argsort(dl, kind="stable")
        dl, pl, wl = dl[perm], pl[perm], wl[perm]
        starts = np.searchsorted(dl, np.arange(m_loc), side="left")
        ends = np.searchsorted(dl, np.arange(m_loc), side="right")
        src_l_all.append(pl)
        w_l_all.append(wl)
        seg_l_all.append(np.stack([starts, ends]))

        # Boundary: sort by global dest id, one partial per distinct dest.
        db, pb, wb = gid[dest[~own]], pt_local[~own], w[~own]
        perm = np.argsort(db, kind="stable")
        db, pb, wb = db[perm], pb[perm], wb[perm]
        uniq, first = np.unique(db, return_index=True)
        bstarts = first.astype(np.int64)
        bends = (
            np.append(first[1:], len(db)).astype(np.int64)
            if len(first)
            else np.zeros(0, np.int64)
        )
        src_b_all.append(pb)
        w_b_all.append(wb)
        seg_b_all.append(np.stack([bstarts, bends]))
        partial_dest.append(uniq)

    s_l = _bucket(max(len(a) for a in src_l_all))
    s_b = _bucket(max((len(a) for a in src_b_all), default=1) or 1)
    b_max = _bucket(max((len(u) for u in partial_dest), default=1) or 1, 8)

    src_l = np.zeros((d, s_l), np.int32)
    w_l = np.zeros((d, s_l), np.float32)
    seg_l = np.zeros((d, 2, m_loc), np.int32)
    src_b = np.zeros((d, s_b), np.int32)
    w_b = np.zeros((d, s_b), np.float32)
    seg_b = np.zeros((d, 2, b_max), np.int32)
    for s in range(d):
        src_l[s, : len(src_l_all[s])] = src_l_all[s]
        w_l[s, : len(w_l_all[s])] = w_l_all[s]
        seg_l[s] = seg_l_all[s]
        src_b[s, : len(src_b_all[s])] = src_b_all[s]
        w_b[s, : len(w_b_all[s])] = w_b_all[s]
        seg_b[s, :, : seg_b_all[s].shape[1]] = seg_b_all[s]

    # Receiver routing: partial slot (s, b) lands at flat index s*B + b.
    recv_lists = [[] for _ in range(d)]  # (local dest, flat index)
    for s in range(d):
        for b, g in enumerate(partial_dest[s]):
            o = int(g // m_loc)
            recv_lists[o].append((int(g % m_loc), s * b_max + b))
    r_max = _bucket(max((len(r) for r in recv_lists), default=1) or 1, 8)
    recv_idx = np.full((d, r_max), d * b_max, np.int32)  # pad -> zero slot
    seg_r = np.zeros((d, 2, m_loc), np.int32)
    for s in range(d):
        rl = sorted(recv_lists[s])
        dests = np.array([x[0] for x in rl], np.int64)
        recv_idx[s, : len(rl)] = [x[1] for x in rl]
        seg_r[s, 0] = np.searchsorted(dests, np.arange(m_loc), side="left")
        seg_r[s, 1] = np.searchsorted(dests, np.arange(m_loc), side="right")

    # ------------------------------------------------------------------
    # Halo: per shard, the remote vertices referenced by its blur
    # neighbors or its points' slice corners.
    n1g = np.where(lattice.blur_n1 < m, gid[np.minimum(lattice.blur_n1, m - 1)], -1)
    n2g = np.where(lattice.blur_n2 < m, gid[np.minimum(lattice.blur_n2, m - 1)], -1)

    halo_sets = []
    for s in range(d):
        mine = np.flatnonzero(owner == s)  # original vertex ids
        need = []
        for tbl in (n1g, n2g):
            t = tbl[:, mine].reshape(-1)
            need.append(t[t >= 0])
        # Slice corners of this shard's points.
        rows = np.arange(s * n_loc, (s + 1) * n_loc)
        dest = offs_s[rows].reshape(-1)
        dest = dest[dest < m]
        need.append(gid[dest])
        need = np.unique(np.concatenate(need)) if need else np.zeros(0, np.int64)
        need = need[need // m_loc != s]  # remote only
        halo_sets.append(need)

    # Publish lists: union over receivers of what they need from owner o.
    pub_sets = [[] for _ in range(d)]
    for s in range(d):
        for g in halo_sets[s]:
            pub_sets[int(g // m_loc)].append(int(g % m_loc))
    pub_lists = [np.unique(np.array(p, np.int64)) for p in pub_sets]
    u_max = _bucket(max((len(p) for p in pub_lists), default=1) or 1, 8)
    h_max = _bucket(max((len(h) for h in halo_sets), default=1) or 1, 8)

    pub_idx = np.zeros((d, u_max), np.int32)
    for s in range(d):
        pub_idx[s, : len(pub_lists[s])] = pub_lists[s]

    # halo entry (shard r needs global g): find g in owner's publish list.
    pub_pos = {}  # global id -> flat publish-pool index
    for o in range(d):
        for u, l in enumerate(pub_lists[o]):
            pub_pos[o * m_loc + int(l)] = o * u_max + u
    halo_idx = np.zeros((d, h_max), np.int32)
    halo_pos = [dict() for _ in range(d)]  # global id -> pool index
    for s in range(d):
        for k, g in enumerate(halo_sets[s]):
            halo_idx[s, k] = pub_pos[int(g)]
            halo_pos[s][int(g)] = m_loc + k

    # ------------------------------------------------------------------
    # Blur + slice tables in pool coordinates.
    zero_slot = m_loc + h_max

    def to_pool(s: int, g: np.ndarray) -> np.ndarray:
        """Global renumbered ids (or -1 = missing) -> pool indices."""
        out = np.full(g.shape, zero_slot, np.int64)
        local = (g >= 0) & (g // m_loc == s)
        out[local] = g[local] % m_loc
        remote = (g >= 0) & ~local
        if remote.any():
            lut = halo_pos[s]
            out[remote] = [lut[int(x)] for x in g[remote]]
        return out

    blur_n1 = np.full((d, d1, m_loc), zero_slot, np.int32)
    blur_n2 = np.full((d, d1, m_loc), zero_slot, np.int32)
    offsets_p = np.full((d, d1, n_loc), zero_slot, np.int32)
    bary_p = np.zeros((d, d1, n_loc), np.float32)
    for s in range(d):
        mine = np.flatnonzero(owner == s)
        li = local_id[mine]
        blur_n1[s, :, li] = to_pool(s, n1g[:, mine]).T
        blur_n2[s, :, li] = to_pool(s, n2g[:, mine]).T
        rows = np.arange(s * n_loc, (s + 1) * n_loc)
        dest = offs_s[rows]  # [n_loc, d1], == m for padded points
        g = np.where(dest < m, gid[np.minimum(dest, m - 1)], -1)
        offsets_p[s] = to_pool(s, g).T
        bary_p[s] = bary_s[rows].T

    return ShardedLatticePlan(
        n_shards=d, d1=d1, n=n, n_loc=n_loc, m=m, m_loc=m_loc,
        point_order=order.astype(np.int64),
        src_l=src_l, w_l=w_l, seg_l=seg_l,
        src_b=src_b, w_b=w_b, seg_b=seg_b,
        recv_idx=recv_idx, seg_r=seg_r,
        pub_idx=pub_idx, halo_idx=halo_idx,
        blur_n1=blur_n1, blur_n2=blur_n2,
        offsets=offsets_p, barycentric=bary_p,
    )


# ----------------------------------------------------------------------
# Device side
# ----------------------------------------------------------------------


def _seg_sum(contrib: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
    """[C, S] stream (sorted by segment) -> [C, len] via prefix diffs."""
    return segment_sum_sorted_t(contrib, seg[0], seg[1])


def _filter_shard(values_t, plan_args, axis, d1, m_loc, reverse=False):
    """One permutohedral filter on a [C, n_loc] shard (inside shard_map)."""
    (src_l, w_l, seg_l, src_b, w_b, seg_b, recv_idx, seg_r,
     pub_idx, halo_idx, n1, n2, offs, bary) = plan_args
    c = values_t.shape[0]
    alpha = 1.0 / (1.0 + 2.0 ** (-(d1 - 1)))

    def pool_of(verts):
        pub = jnp.take(verts, pub_idx, axis=1)  # [C, U]
        allu = jax.lax.all_gather(pub, axis)  # [D, C, U]
        flat = jnp.swapaxes(allu, 0, 1).reshape(c, -1)
        halo = jnp.take(flat, halo_idx, axis=1)  # [C, H]
        zero = jnp.zeros((c, 1), verts.dtype)
        return jnp.concatenate([verts, halo, zero], axis=1)

    # Splat: local segment sums + exchanged boundary partials.
    verts = _seg_sum(jnp.take(values_t, src_l, axis=1) * w_l[None], seg_l)
    partials = _seg_sum(jnp.take(values_t, src_b, axis=1) * w_b[None], seg_b)
    allp = jax.lax.all_gather(partials, axis)  # [D, C, B]
    flat = jnp.swapaxes(allp, 0, 1).reshape(c, -1)
    flat = jnp.concatenate([flat, jnp.zeros((c, 1), flat.dtype)], axis=1)
    verts = verts + _seg_sum(jnp.take(flat, recv_idx, axis=1), seg_r)

    # Blur: halo exchange per pass (each pass reads the previous pass's
    # values, including remote ones).
    order = range(d1 - 1, -1, -1) if reverse else range(d1)
    for j in order:
        pool = pool_of(verts)
        n1v = jnp.take(pool, n1[j], axis=1)
        n2v = jnp.take(pool, n2[j], axis=1)
        verts = verts + 0.5 * (n1v + n2v)

    # Slice (halo once more for remote corners).
    pool = pool_of(verts)
    gathered = jnp.take(pool, offs.reshape(-1), axis=1).reshape(
        c, d1, -1
    )
    return (gathered * bary[None]).sum(axis=1) * alpha


def vertex_sharded_potts_mean_field(
    mesh: Mesh,
    axis: str,
    unary: np.ndarray,  # [N, Ctot] energies (all layers concatenated)
    lattice: PermutohedralLattice,
    weight: float,
    blocks: Tuple[int, ...],
    n_iterations: int,
    plan: "ShardedLatticePlan | None" = None,
) -> np.ndarray:
    """Mean-field marginals [N, Ctot] with points AND vertices sharded.

    Matches ``potts_mean_field_multi_t`` numerically (same transposed
    formulation, same symmetric normalization from a filtered ones-vector,
    f32 summation order differs within segments only).
    """
    d = mesh.shape[axis]
    if plan is None:
        plan = plan_sharded_lattice(lattice, d)
    n, ctot = unary.shape
    d1, m_loc, n_loc = plan.d1, plan.m_loc, plan.n_loc

    # Unaries to sorted-point order, transposed, shard-padded.
    u_t = np.zeros((ctot, d * n_loc), np.float32)
    u_t[:, : plan.n] = np.asarray(unary, np.float32)[plan.point_order].T

    plan_specs = (
        plan.src_l, plan.w_l, plan.seg_l, plan.src_b, plan.w_b, plan.seg_b,
        plan.recv_idx, plan.seg_r, plan.pub_idx, plan.halo_idx,
        plan.blur_n1, plan.blur_n2, plan.offsets, plan.barycentric,
    )

    def step_fn(u_s, *args):
        # Each arg arrives [1, ...]: drop the shard axis.
        args = tuple(a[0] for a in args)
        filt = partial(
            _filter_shard, plan_args=args, axis=axis, d1=d1, m_loc=m_loc
        )

        raw = filt(jnp.ones((1, u_s.shape[1]), jnp.float32))[0]
        norm = 1.0 / jnp.sqrt(raw + 1e-20)

        def block_softmax(t):
            outs = []
            start = 0
            for c in blocks:
                outs.append(exp_and_normalize(t[start : start + c].T).T)
                start += c
            return jnp.concatenate(outs, axis=0)

        q = block_softmax(-u_s)

        def body(q, _):
            filtered = filt(q * norm[None]) * norm[None]
            q_new = block_softmax(-u_s + weight * filtered)
            return q_new, None

        q, _ = jax.lax.scan(body, q, None, length=n_iterations)
        return q

    in_specs = (P(None, axis),) + tuple(P(axis) for _ in plan_specs)
    sharded = jax.shard_map(
        step_fn, mesh=mesh, in_specs=in_specs, out_specs=P(None, axis)
    )
    args_dev = [
        jax.device_put(jnp.asarray(u_t), NamedSharding(mesh, P(None, axis)))
    ] + [
        jax.device_put(jnp.asarray(a), NamedSharding(mesh, P(axis)))
        for a in plan_specs
    ]
    q_t = np.asarray(sharded(*args_dev))  # [Ctot, D*n_loc] sorted order

    out = np.zeros((n, ctot), np.float32)
    out[plan.point_order] = q_t[:, : plan.n].T
    return out


# ----------------------------------------------------------------------
# Variant selection (per map, at load time)
# ----------------------------------------------------------------------


def choose_crf_variant(plan: ShardedLatticePlan) -> str:
    """``'vertex'`` when the halo design moves fewer values per filter.

    The plan carries both designs' measured comm volumes: the vertex-sharded
    halo exchange moves O(boundary) surface terms, the replicated design
    psums the whole [C, M+1] vertex table. High-locality clouds (surfaces,
    scan lines) have small boundaries and flip to ``'vertex'`` once M grows;
    low-locality clouds (near-random feature spreads) stay ``'replicated'``
    (see SCALING.md for the measured crossover).
    """
    if plan.comms_per_filter < plan.replicated_comms_per_filter:
        return "vertex"
    return "replicated"


def auto_sharded_potts_mean_field(
    mesh: Mesh,
    axis: str,
    unary: np.ndarray,  # [N, Ctot] energies (all layers concatenated)
    lattice: PermutohedralLattice,
    weight: float,
    blocks: Tuple[int, ...],
    n_iterations: int,
    plan: "ShardedLatticePlan | None" = None,
    force: "str | None" = None,
) -> "Tuple[np.ndarray, str]":
    """Sharded mean-field with the comm-cheaper variant chosen per map.

    Plans the vertex sharding once (host-side, at map load), compares the
    two designs' comm volumes (:func:`choose_crf_variant`), and runs the
    winner. ``force`` overrides the choice ('replicated' | 'vertex').
    Returns ``(marginals [N, Ctot], variant_used)``; both variants match
    the single-device ``potts_mean_field_multi_t`` numerically.
    """
    d = mesh.shape[axis]
    if plan is None:
        plan = plan_sharded_lattice(lattice, d)
    variant = force or choose_crf_variant(plan)
    if variant == "vertex":
        q = vertex_sharded_potts_mean_field(
            mesh, axis, unary, lattice, weight, blocks, n_iterations,
            plan=plan,
        )
    elif variant == "replicated":
        from .sharded_crf import sharded_potts_mean_field_t

        q = sharded_potts_mean_field_t(
            mesh, axis, unary, lattice, weight, blocks, n_iterations
        )
    else:
        raise ValueError(f"unknown CRF sharding variant {variant!r}")
    return q, variant
