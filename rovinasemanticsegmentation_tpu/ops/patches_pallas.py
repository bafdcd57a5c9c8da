"""Pallas TPU kernel for depth-adaptive patch extraction.

Fourth-generation formulation (after the gather version in ``ops/patches.py``,
the dense-slice scan in ``ops/patches_scan.py``, and the per-(i,j,ch) tap
kernel this file held through round 2). The scan's cost scales with (distinct
window sizes present in the FRAME) x (full-frame slices); this kernel
exploits locality instead, and batches the inner resize so the per-window-size
cost is a handful of wide vector ops instead of ~3600 narrow ones:

- one program covers 8 grid rows; their source window (8*stride + 2B rows x
  the full padded width) is DMA'd once into VMEM, double phase-split (row
  phase x column phase by ``stride``) so every tap row is a contiguous
  sublane read and every tap column a dynamic lane rotation;
- the window-size loop runs over only the h values present in THOSE 8 rows
  (neighboring pixels have similar depth, so per-block h-sets are small);
- per (h, output row i): two sublane row-reads + channel unpack + row
  interpolation into an i-stacked scratch ``ri[colphase, ch, i, row, lane]``;
- per (h, output col j, ch): ONE colphase select + two dynamic lane rolls +
  fixed-point column interpolation on the whole ``[R, 8, WL]`` i-stack, and
  ONE masked store into the ``[j*3+ch, i, row, lane]``-layout accumulator --
  the rolls/madds/stores that used to run per (i, j, ch) now run per (j, ch)
  on 11x-wider data, which is the difference between op-overhead-bound and
  throughput-bound on the VPU;
- the (i,j,ch) -> feature-order unswizzle happens OUTSIDE the kernel as one
  XLA transpose of the uint8 output (it used to be 363 narrow VMEM stores
  per h inside the kernel).

Bit-exact with the other two implementations (same 1/2048 weights and
``(acc + 2^21) >> 22`` rounding). Reference semantics:
``/root/reference/include/feature_extractor.h:125-175`` (window
``patch_size/depth``, bilinear resize to ``patch_size_reduce^2 x 3``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .patches_scan import _tap_tables

LANES = 128
ROWS_PER_PROGRAM = 8  # default grid rows per program (see rows_per_program)


def _kernel(
    present_ref,  # SMEM [blocks, NH] h-presence counts (indexed by program)
    t0_ref,  # SMEM [NH, R]
    t1_ref,  # SMEM [NH, R]
    w0_ref,  # SMEM [NH, R]
    w1_ref,  # SMEM [NH, R]
    half_ref,  # VMEM [8, WL] per-point half (-1 pad)
    img_ref,  # ANY  [s, HPH, s, WL] packed phased image (whole array)
    out_ref,  # VMEM [KC, R, 8, WL] uint8, KC = 3R (j,ch-major layout);
    #            doubles as the accumulator (post-shift values fit u8)
    region_ref,  # scratch VMEM [s, WINS, s, WL] int32
    ri_ref,  # scratch VMEM [s, 3, R, 8, WL] int32 (row-interp i-stack)
    sem,  # DMA semaphore
    *,
    stride: int,
    nh: int,
    r_size: int,
    wins: int,
    wl: int,
    rows: int,
):
    prog = pl.program_id(0)
    r0 = prog * rows

    copy = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(r0, wins)], region_ref, sem
    )
    copy.start()

    half = half_ref[:, :]  # [8, WL]
    out_ref[...] = jnp.zeros(out_ref.shape, jnp.uint8)

    copy.wait()

    def h_body(h, _):
        @pl.when(present_ref[prog, h] > 0)
        def _():
            mask = (half == h)[None]  # [1, 8, WL] -> broadcasts over i
            # --- row stage: interpolate the 2R tap rows into ri ---
            for i in range(r_size):
                oy0 = t0_ref[h, i]
                oy1 = t1_ref[h, i]
                wy0 = w0_ref[h, i]
                wy1 = w1_ref[h, i]

                def tap_rows(oy):
                    # Tap row for grid row k is k*s + oy; in phased coords
                    # that's phase oy % s, rows r_local + oy // s.
                    ph = oy % stride
                    base = oy // stride
                    # [8, s(colphase), WL]
                    return region_ref[ph, pl.ds(base, rows), :, :]

                rows0 = tap_rows(oy0)
                rows1 = tap_rows(oy1)
                for cp in range(stride):
                    for ch in range(3):
                        a = (rows0[:, cp, :] >> (8 * ch)) & 255
                        b = (rows1[:, cp, :] >> (8 * ch)) & 255
                        ri_ref[cp, ch, i] = wy0 * a + wy1 * b

            # --- column stage: whole i-stack per (j, ch) ---
            for j in range(r_size):
                ox0 = t0_ref[h, j]
                ox1 = t1_ref[h, j]
                wx0 = w0_ref[h, j]
                wx1 = w1_ref[h, j]
                cp0 = ox0 % stride
                cp1 = ox1 % stride
                sh0 = ox0 // stride
                sh1 = ox1 // stride
                for ch in range(3):
                    stack = ri_ref[:, ch]  # [s, R, 8, WL]
                    sel0 = stack[0]
                    sel1 = stack[0]
                    for c in range(1, stride):
                        sel0 = jnp.where(cp0 == c, stack[c], sel0)
                        sel1 = jnp.where(cp1 == c, stack[c], sel1)
                    v0 = pltpu.roll(sel0, -sh0, axis=2)
                    v1 = pltpu.roll(sel1, -sh1, axis=2)
                    val = (wx0 * v0 + wx1 * v1 + (1 << 21)) >> 22
                    val = jnp.clip(val, 0, 255).astype(jnp.uint8)
                    k = j * 3 + ch
                    out_ref[k] = jnp.where(mask, val, out_ref[k])
        return 0

    jax.lax.fori_loop(0, nh, h_body, 0)


@partial(
    jax.jit,
    static_argnames=("patch_size", "reduce_size", "stride", "interpret",
                     "rows_per_program"),
)
def extract_patches_pallas(
    padded_lab: jnp.ndarray,  # [Hp, Wp, 3] uint8
    depth_grid: jnp.ndarray,  # [gh, gw] float32 meters (<= 0 masked)
    patch_size: int,
    reduce_size: int,
    stride: int,
    interpret: bool = False,
    rows_per_program: int = ROWS_PER_PROGRAM,
) -> jnp.ndarray:  # [gh, gw, R, R, 3] uint8
    interpret = interpret or jax.default_backend() != "tpu"
    rp = rows_per_program
    b = patch_size
    r = reduce_size
    nh = b + 1
    gh, gw = depth_grid.shape
    s = stride

    # half per grid point (feature_extractor.h:140), -1 where masked.
    safe = jnp.maximum(depth_grid, 1e-6)
    half = jnp.floor(b / (2.0 * safe)).astype(jnp.int32)
    half = jnp.where(depth_grid > 0, jnp.minimum(half, b), -1)

    # Pack Lab and phase-split rows/columns by stride.
    img = padded_lab.astype(jnp.int32)
    packed = img[..., 0] | (img[..., 1] << 8) | (img[..., 2] << 16)

    wins = rp + (2 * b) // s + 1
    gh_pad = -(-gh // rp) * rp
    hph = gh_pad + wins  # phased rows needed
    cols_per_phase = -(-padded_lab.shape[1] // s)
    wl = -(-cols_per_phase // LANES) * LANES

    need_h = hph * s
    need_w = wl * s
    packed = jnp.pad(
        packed,
        (
            (0, max(0, need_h - packed.shape[0])),
            (0, max(0, need_w - packed.shape[1])),
        ),
    )[:need_h, :need_w]
    # [s(rowphase), HPH, s(colphase), WL]
    phased = (
        packed.reshape(hph, s, wl, s).transpose(1, 0, 3, 2)
    )

    half_pad = jnp.pad(
        half, ((0, gh_pad - gh), (0, wl - gw)), constant_values=-1
    )

    # Per-block h presence.
    blocks = gh_pad // rp
    half_blocks = half_pad.reshape(blocks, rp * wl)
    onehot = jax.nn.one_hot(
        jnp.clip(half_blocks, 0, nh - 1), nh, dtype=jnp.int32
    ) * (half_blocks >= 0)[..., None]
    present = onehot.sum(axis=1)  # [blocks, NH]

    t0_np, t1_np, w0_np, w1_np = _tap_tables(b, r)
    kc = 3 * r  # (j, ch)-major channel dim of the kernel output

    out = pl.pallas_call(
        partial(
            _kernel,
            stride=s,
            nh=nh,
            r_size=r,
            wins=wins,
            wl=wl,
            rows=rp,
        ),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (rp, wl), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (kc, r, rp, wl), lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((kc, r, gh_pad, wl), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((s, wins, s, wl), jnp.int32),
            pltpu.VMEM((s, 3, r, rp, wl), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        present,
        jnp.asarray(t0_np),
        jnp.asarray(t1_np),
        jnp.asarray(w0_np),
        jnp.asarray(w1_np),
        half_pad,
        phased,
    )

    # [KC(j,ch), R(i), gh_pad, WL] -> [gh, gw, R(i), R(j), 3(ch)]
    out = out[:, :, :gh, :gw]
    out = jnp.transpose(out, (2, 3, 1, 0))  # [gh, gw, i, (j,ch)]
    return out.reshape(gh, gw, r, r, 3)
