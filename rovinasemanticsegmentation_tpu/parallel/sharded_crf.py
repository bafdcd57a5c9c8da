"""Point-sharded dense-CRF mean-field: the long-context component.

The reference's only "sequence length" axis is the number of cloud points N
per local map, handled by the permutohedral lattice's O(N*(d+1)) filtering
(SURVEY.md §5). Scaling N beyond one chip mirrors context-parallel attention:

- the marginal matrix Q [N, C], the per-point simplex data (offsets,
  barycentric, norms) and the unaries shard along N over the mesh's point
  axis;
- lattice vertices [M+1, C] are the shared state: each device splats its
  point shard into a local vertex copy, a ``psum`` over the axis reduces the
  partial vertex values (the ring-exchange of vertex partials over ICI),
  the d+1 blur passes run replicated, and slicing back to points is local.

One psum of [M+1, C] per mean-field iteration is the only cross-chip
traffic; everything else stays on-shard.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.crf import exp_and_normalize
from ..models.lattice import PermutohedralLattice


def _blur(verts: jnp.ndarray, blur_n1: jnp.ndarray, blur_n2: jnp.ndarray,
          m: int) -> jnp.ndarray:
    d1 = blur_n1.shape[0]
    for j in range(d1):
        n1v = jnp.take(verts, blur_n1[j], axis=0)
        n2v = jnp.take(verts, blur_n2[j], axis=0)
        real = verts[:m] + 0.5 * (n1v + n2v)
        verts = jnp.concatenate(
            [real, jnp.zeros((1, verts.shape[1]), verts.dtype)], axis=0
        )
    return verts


def sharded_potts_mean_field(
    mesh: Mesh,
    axis: str,
    unary: np.ndarray,  # [N, C] energies (already -accumulated unaries)
    lattice: PermutohedralLattice,
    norm: np.ndarray,  # [N] symmetric normalization
    weight: float,
    n_iterations: int,
) -> np.ndarray:
    """Mean-field marginals with Q sharded along points over ``axis``.

    N is padded to the axis size with dummy isolated points (barycentric 0,
    all corners pointing at the zero slot), which contribute nothing to the
    vertex reduction.
    """
    n, c = unary.shape
    devices = mesh.shape[axis]
    m = lattice.num_vertices
    d1 = lattice.offsets.shape[1]
    alpha = 1.0 / (1.0 + 2.0 ** (-(d1 - 1)))

    n_pad = -(-n // devices) * devices
    pad = n_pad - n

    def pad0(a, value=0):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, constant_values=value)

    unary_p = pad0(np.asarray(unary, np.float32))
    offsets_p = pad0(lattice.offsets, value=m)  # pad corners -> zero slot
    bary_p = pad0(lattice.barycentric)  # zero weights
    norm_p = pad0(np.asarray(norm, np.float32))

    blur_n1 = jnp.asarray(lattice.blur_n1)
    blur_n2 = jnp.asarray(lattice.blur_n2)

    def step_fn(unary_s, offsets_s, bary_s, norm_s):
        # All arguments are per-shard [N/D, ...].
        def one_filter(q):
            contrib = (q * norm_s[:, None])[:, None, :] * bary_s[:, :, None]
            verts = jnp.zeros((m + 1, c), jnp.float32)
            verts = verts.at[offsets_s.reshape(-1)].add(
                contrib.reshape(-1, c)
            )
            verts = jax.lax.psum(verts, axis)  # vertex partial reduction
            verts = _blur(verts, blur_n1, blur_n2, m)
            gathered = jnp.take(verts, offsets_s, axis=0)
            out = (gathered * bary_s[:, :, None]).sum(axis=1) * alpha
            return out * norm_s[:, None]

        q = exp_and_normalize(-unary_s)

        def body(q, _):
            q_new = exp_and_normalize(-unary_s + weight * one_filter(q))
            return q_new, None

        q, _ = jax.lax.scan(body, q, None, length=n_iterations)
        return q

    shard = NamedSharding(mesh, P(axis))
    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    q = sharded(
        jax.device_put(jnp.asarray(unary_p), shard),
        jax.device_put(jnp.asarray(offsets_p), shard),
        jax.device_put(jnp.asarray(bary_p), shard),
        jax.device_put(jnp.asarray(norm_p), shard),
    )
    return np.asarray(q)[:n]
