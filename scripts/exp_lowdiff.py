"""Diff the LOWERED modules of exp_frame_split.s_extract vs exp_concat.v_d.

Both claim to compute the same batched extract (B=10 VGA frames through
_extract_impl + axis-0 concat + sum), yet measure 279 vs 144 ms/batch and
compile in 415 vs ~32 s. Lowering is cheap (no XLA compile), so this dumps
an op histogram per module and the diff — whatever op class exists only in
the slow one is the culprit.

Usage: python scripts/exp_lowdiff.py
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rovinasemanticsegmentation_tpu.features.extractor import (
    FeatureConfig,
    _extract_impl,
)
from rovinasemanticsegmentation_tpu.utils import tpu_lock

H, W, STRIDE, B = 480, 640, 2, 10


def main():
    if not tpu_lock.acquire(timeout_s=3600):
        return 2
    rng = np.random.default_rng(0)
    cfg = FeatureConfig()

    rgb = jnp.asarray(np.stack(
        [rng.integers(0, 256, (H, W, 3), dtype=np.uint8) for _ in range(B)]))
    depth = jnp.asarray(np.stack(
        [rng.integers(0, 15500, (H, W), dtype=np.uint16) for _ in range(B)]))
    kinv = jnp.asarray(np.tile(np.linalg.inv(
        np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]])
    )[None].astype(np.float32), (B, 1, 1)))
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (B, 1, 1)))
    trans = jnp.zeros((B, 3), jnp.float32)
    dmin, dmax = jnp.float32(cfg.d_min), jnp.float32(cfg.d_max)

    def extract_all(rgb_b, depth_b):
        feats, masks = [], []
        for i in range(B):
            f, m, _, _ = _extract_impl(
                rgb_b[i], depth_b[i], kinv[i], rot[i], trans[i], dmin, dmax,
                stride=STRIDE, patch_size=cfg.patch_size,
                reduce_size=cfg.patch_size_reduce,
                use_color_patch=cfg.use_color_patch, use_depth=cfg.use_depth,
                use_height=cfg.use_height, use_normal=cfg.use_normal,
            )
            feats.append(f)
            masks.append(m)
        return jnp.concatenate(feats, axis=0), masks

    @jax.jit
    def perturb_j(e):
        return (rgb ^ e.astype(jnp.uint8),
                jnp.where(depth > 0, depth + e.astype(jnp.uint16), 0))

    # exp_frame_split.s_extract verbatim (perturb is itself jitted).
    @jax.jit
    def s_extract(e):
        feats, masks = extract_all(*perturb_j(e))
        return jnp.sum(feats) + sum(jnp.sum(m) for m in masks)

    def perturb_p(e):
        return (rgb ^ e.astype(jnp.uint8),
                jnp.where(depth > 0, depth + e.astype(jnp.uint16), 0))

    # exp_concat.v_d verbatim (perturb is a plain function).
    @jax.jit
    def v_d(e):
        rgb_b, depth_b = perturb_p(e)
        fs, ms = [], []
        for i in range(B):
            f, m, _, _ = _extract_impl(
                rgb_b[i], depth_b[i], kinv[i], rot[i], trans[i], dmin, dmax,
                stride=STRIDE, patch_size=cfg.patch_size,
                reduce_size=cfg.patch_size_reduce,
                use_color_patch=cfg.use_color_patch, use_depth=cfg.use_depth,
                use_height=cfg.use_height, use_normal=cfg.use_normal,
            )
            fs.append(f)
            ms.append(m)
        return jnp.sum(jnp.concatenate(fs, axis=0)) + sum(
            jnp.sum(m) for m in ms)

    hists = {}
    for name, fn in [("s_extract", s_extract), ("v_d", v_d)]:
        txt = fn.lower(jnp.int32(1)).as_text()
        ops = collections.Counter(
            m.group(1) for m in re.finditer(r"= \"?([a-z_.]+)\"?\(", txt)
        )
        hists[name] = ops
        print(f"{name}: {sum(ops.values())} ops, {len(txt)} chars")
    keys = sorted(set(hists["s_extract"]) | set(hists["v_d"]))
    print(f"{'op':34s} {'s_extract':>10s} {'v_d':>10s}")
    for k in keys:
        a, b = hists["s_extract"].get(k, 0), hists["v_d"].get(k, 0)
        flag = "  <<<" if a != b else ""
        print(f"{k:34s} {a:10d} {b:10d}{flag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
