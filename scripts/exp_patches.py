"""Patches-kernel row-stage batching experiment (round 3).

The production kernel's row stage runs per (i, colphase, ch): 11 x 2 x 3
= 66 narrow [8, WL] unpack+madd ops per present window size. Variant E
pre-unpacks the DMA'd region into a [3(ch), s, wins, s, WL] scratch once
per block (3 wide ops), so the row stage reads 3-channel stacks and runs
per (i, colphase): 22 ops on 3x-wider data.

Usage:
  python scripts/exp_patches.py parity   # CPU interpret parity
  python scripts/exp_patches.py bench    # TPU slope timing vs production
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "parity"
if MODE == "parity":
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

from rovinasemanticsegmentation_tpu.ops.patches_pallas import (
    LANES,
    ROWS_PER_PROGRAM,
    extract_patches_pallas,
)
from rovinasemanticsegmentation_tpu.ops.patches_scan import _tap_tables
from rovinasemanticsegmentation_tpu.ops.color import rgb_to_lab8
from rovinasemanticsegmentation_tpu.ops.patches import reflect_pad_image


def _kernel_e(
    present_ref, t0_ref, t1_ref, w0_ref, w1_ref, half_ref, img_ref, out_ref,
    region_ref, reg3_ref, ri_ref, sem,
    *, stride, nh, r_size, wins, wl,
):
    prog = pl.program_id(0)
    r0 = prog * ROWS_PER_PROGRAM

    copy = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(r0, wins)], region_ref, sem
    )
    copy.start()

    half = half_ref[:, :]
    out_ref[...] = jnp.zeros(out_ref.shape, jnp.uint8)

    copy.wait()
    # Pre-unpack the region's 3 packed channels ONCE per block.
    reg = region_ref[...]  # [s, wins, s, WL] int32
    for ch in range(3):
        reg3_ref[ch] = (reg >> (8 * ch)) & 255

    def h_body(h, _):
        @pl.when(present_ref[prog, h] > 0)
        def _():
            mask = (half == h)[None]
            for i in range(r_size):
                oy0 = t0_ref[h, i]
                oy1 = t1_ref[h, i]
                wy0 = w0_ref[h, i]
                wy1 = w1_ref[h, i]

                def tap_rows(oy):
                    ph = oy % stride
                    base = oy // stride
                    # [3, 8, s, WL]
                    return reg3_ref[:, ph, pl.ds(base, ROWS_PER_PROGRAM)]

                rows0 = tap_rows(oy0)
                rows1 = tap_rows(oy1)
                for cp in range(stride):
                    # ONE madd over the 3-channel stack per colphase.
                    ri_ref[cp, :, i] = (
                        wy0 * rows0[:, :, cp, :] + wy1 * rows1[:, :, cp, :]
                    )

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
    static_argnames=("patch_size", "reduce_size", "stride", "interpret"),
)
def extract_patches_e(
    padded_lab, depth_grid, patch_size, reduce_size, stride,
    interpret=False,
):
    interpret = interpret or jax.default_backend() != "tpu"
    b, r, s = patch_size, reduce_size, stride
    nh = b + 1
    gh, gw = depth_grid.shape

    safe = jnp.maximum(depth_grid, 1e-6)
    half = jnp.floor(b / (2.0 * safe)).astype(jnp.int32)
    half = jnp.where(depth_grid > 0, jnp.minimum(half, b), -1)

    img = padded_lab.astype(jnp.int32)
    packed = img[..., 0] | (img[..., 1] << 8) | (img[..., 2] << 16)

    wins = ROWS_PER_PROGRAM + (2 * b) // s + 1
    gh_pad = -(-gh // ROWS_PER_PROGRAM) * ROWS_PER_PROGRAM
    hph = gh_pad + wins
    cols_per_phase = -(-padded_lab.shape[1] // s)
    wl = -(-cols_per_phase // LANES) * LANES

    need_h = hph * s
    need_w = wl * s
    packed = jnp.pad(
        packed,
        ((0, max(0, need_h - packed.shape[0])),
         (0, max(0, need_w - packed.shape[1]))),
    )[:need_h, :need_w]
    phased = packed.reshape(hph, s, wl, s).transpose(1, 0, 3, 2)

    half_pad = jnp.pad(
        half, ((0, gh_pad - gh), (0, wl - gw)), constant_values=-1
    )
    blocks = gh_pad // ROWS_PER_PROGRAM
    half_blocks = half_pad.reshape(blocks, ROWS_PER_PROGRAM * wl)
    onehot = jax.nn.one_hot(
        jnp.clip(half_blocks, 0, nh - 1), nh, dtype=jnp.int32
    ) * (half_blocks >= 0)[..., None]
    present = onehot.sum(axis=1)

    t0_np, t1_np, w0_np, w1_np = _tap_tables(b, r)
    kc = 3 * r

    out = pl.pallas_call(
        partial(_kernel_e, stride=s, nh=nh, r_size=r, wins=wins, wl=wl),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (ROWS_PER_PROGRAM, wl), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (kc, r, ROWS_PER_PROGRAM, wl), lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((kc, r, gh_pad, wl), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((s, wins, s, wl), jnp.int32),
            pltpu.VMEM((3, s, wins, s, wl), jnp.int32),
            pltpu.VMEM((s, 3, r, ROWS_PER_PROGRAM, wl), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        present, jnp.asarray(t0_np), jnp.asarray(t1_np),
        jnp.asarray(w0_np), jnp.asarray(w1_np), half_pad, phased,
    )
    out = out[:, :, :gh, :gw]
    out = jnp.transpose(out, (2, 3, 1, 0))
    return out.reshape(gh, gw, r, r, 3)


def make_depth(r, h, w):
    ys, xs = np.mgrid[0:h, 0:w]
    depth = (3000.0 + 1500.0 * np.sin(xs / w * np.pi * r.uniform(0.5, 2.0))
             + 1000.0 * (ys / h) * r.uniform(0.5, 3.0))
    for _ in range(6):
        bh, bw = r.integers(h // 8, h // 2), r.integers(w // 8, w // 2)
        y0, x0 = r.integers(0, h - bh), r.integers(0, w - bw)
        depth[y0:y0 + bh, x0:x0 + bw] = r.uniform(700, 2500)
    depth += r.normal(0, 15, (h, w))
    depth[r.random((h, w)) < 0.02] = 0
    return np.clip(depth, 0, 15500).astype(np.uint16)


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if MODE == "bench" and not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping TPU bench",
              file=sys.stderr)
        raise SystemExit(3)
    rng = np.random.default_rng(0)
    if MODE == "parity":
        h, w, b, r, s = 64, 96, 21, 7, 2
    else:
        h, w, b, r, s = 480, 640, 77, 11, 2
    rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    depth = jnp.asarray(make_depth(rng, h, w))
    lab = reflect_pad_image(rgb_to_lab8(rgb), b)
    dgrid = depth[::s, ::s].astype(jnp.float32) / 1000.0

    base = np.asarray(extract_patches_pallas(
        lab, dgrid, patch_size=b, reduce_size=r, stride=s))
    got = np.asarray(extract_patches_e(
        lab, dgrid, patch_size=b, reduce_size=r, stride=s))
    ok = np.array_equal(base, got)
    print("E rowstage3ch:", "PARITY OK" if ok else
          f"MISMATCH {np.mean(base != got)}")
    if MODE != "bench":
        return

    def slope(name, fn):
        times = {}
        for K in (8, 32):
            @jax.jit
            def scanner(base_i):
                def body(c, i):
                    out = fn(dgrid * (1.0 + i.astype(jnp.float32) * 1e-5))
                    return c + jnp.sum(out.astype(jnp.float32)), ()
                tot, _ = jax.lax.scan(
                    body, jnp.float32(0), base_i + jnp.arange(K))
                return tot

            float(scanner(jnp.int32(0)))
            best = 1e9
            for rep in range(1, 3):
                t0 = time.perf_counter()
                float(scanner(jnp.int32(rep * 100 + 1)))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        ms = (times[32] - times[8]) / 24 * 1000
        print(f"{name:20s} {ms:7.2f} ms/iter")
        return ms

    def safe(name, fn):
        try:
            return slope(name, fn)
        except Exception as e:  # a VMEM-overflow variant mustn't kill the run
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            return None

    rows_ms = {}
    rows_ms[8] = safe("A production", lambda d: extract_patches_pallas(
        lab, d, patch_size=b, reduce_size=r, stride=s))
    safe("E rowstage3ch", lambda d: extract_patches_e(
        lab, d, patch_size=b, reduce_size=r, stride=s))
    # Multi-row blocks (round-4 lead): fewer DMAs + wider column-stage ops
    # per program, at the cost of a bigger VMEM footprint per block.
    for rp in (16, 32):
        if tpu_lock.deadline_expired(margin_s=180):
            print("TPUQ_DEADLINE_S reached; stopping row-block sweep",
                  file=sys.stderr)
            break
        rows_ms[rp] = safe(f"A rows={rp}", lambda d, rp=rp: extract_patches_pallas(
            lab, d, patch_size=b, reduce_size=r, stride=s,
            rows_per_program=rp))

    measured = {k: v for k, v in rows_ms.items() if v is not None}
    if (len(measured) >= 2 and rows_ms.get(8) is not None
            and jax.default_backend() == "tpu"):
        # Record the winner for the production default (utils/tuning.py;
        # parity across row-block sizes is pinned by
        # tests/test_feature_ops.py::TestPatchesPallasParity).
        from rovinasemanticsegmentation_tpu.utils import tuning

        best_rp = min(measured, key=measured.get)
        tuning.record(
            "patches_rows_per_program", int(best_rp),
            {"ms": {str(k): round(v, 3) for k, v in measured.items()},
             "script": "exp_patches.py bench"},
        )
        print(f"TUNING: patches_rows_per_program={best_rp}")


if __name__ == "__main__":
    main()
