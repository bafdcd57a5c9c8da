"""Bilinear resize with cv::resize(INTER_LINEAR) semantics.

Used where the reference resizes (a) stride-resolution posterior maps up to
full resolution (``/root/reference/src/test_multi.cpp:199``,
``src/segmenter.cpp:380-382``) and (b) depth-adaptive color patches down to
``patch_size_reduce`` (``include/feature_extractor.h:142``).

OpenCV coordinate mapping: ``src = (dst + 0.5) * scale - 0.5`` with the left
tap clamped into the image and its fraction zeroed at both borders
(modules/imgproc/src/resize.cpp). Two arithmetic modes:

- float (exact for CV_32F inputs, which is what the posterior maps use);
- fixed-point uint8 emulation: weights quantized to 1/2048ths and the
  accumulator rounded with ``(acc + 2^21) >> 22``, OpenCV's generic
  ``FixedPtCast<int, uchar, 22>`` path. OpenCV's SIMD kernels use a slightly
  different truncation order, so individual uint8 values may differ by 1 LSB
  from a specific OpenCV build; feature-level tests use tolerances
  accordingly.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _tap_coords(dst_size: int, src_size: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Left tap index, right tap index, right-tap fraction for one axis."""
    scale = src_size / dst_size
    fx = (jnp.arange(dst_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    ix = jnp.floor(fx).astype(jnp.int32)
    frac = fx - ix.astype(jnp.float32)
    # Border handling (resize.cpp): sx < 0 -> (0, frac 0); sx >= w-1 -> (w-1, frac 0).
    frac = jnp.where(ix < 0, 0.0, frac)
    ix = jnp.maximum(ix, 0)
    frac = jnp.where(ix >= src_size - 1, 0.0, frac)
    ix = jnp.minimum(ix, src_size - 1)
    ix1 = jnp.minimum(ix + 1, src_size - 1)
    return ix, ix1, frac


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Float bilinear resize of [H, W] or [H, W, C] arrays."""
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)
    y0, y1, fy = _tap_coords(out_h, h)
    x0, x1, fx = _tap_coords(out_w, w)

    rows0 = jnp.take(img, y0, axis=0)
    rows1 = jnp.take(img, y1, axis=0)
    if img.ndim == 3:
        fy_b = fy[:, None, None]
        fx_b = fx[None, :, None]
    else:
        fy_b = fy[:, None]
        fx_b = fx[None, :]
    vert = rows0 * (1.0 - fy_b) + rows1 * fy_b
    cols0 = jnp.take(vert, x0, axis=1)
    cols1 = jnp.take(vert, x1, axis=1)
    return cols0 * (1.0 - fx_b) + cols1 * fx_b


_COEF_SCALE = 2048  # 1 << INTER_RESIZE_COEF_BITS(11)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_u8(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Fixed-point uint8 bilinear resize (OpenCV generic 8U path)."""
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.int32)
    y0, y1, fy = _tap_coords(out_h, h)
    x0, x1, fx = _tap_coords(out_w, w)
    # Weights quantized independently, like ialpha/ibeta in resize.cpp.
    wy1 = jnp.round(fy * _COEF_SCALE).astype(jnp.int32)
    wy0 = jnp.round((1.0 - fy) * _COEF_SCALE).astype(jnp.int32)
    wx1 = jnp.round(fx * _COEF_SCALE).astype(jnp.int32)
    wx0 = jnp.round((1.0 - fx) * _COEF_SCALE).astype(jnp.int32)

    if img.ndim == 3:
        exp = lambda v: v[:, None, None]  # noqa: E731
        expx = lambda v: v[None, :, None]  # noqa: E731
    else:
        exp = lambda v: v[:, None]  # noqa: E731
        expx = lambda v: v[None, :]  # noqa: E731

    # Horizontal pass first (as OpenCV does): int rows scaled by 2048.
    cols0 = jnp.take(img, x0, axis=1)
    cols1 = jnp.take(img, x1, axis=1)
    horiz = cols0 * expx(wx0) + cols1 * expx(wx1)
    rows0 = jnp.take(horiz, y0, axis=0)
    rows1 = jnp.take(horiz, y1, axis=0)
    acc = rows0 * exp(wy0) + rows1 * exp(wy1)
    out = (acc + (1 << 21)) >> 22
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
