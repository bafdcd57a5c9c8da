"""Color-space ops: 8-bit Lab conversion and brightness augmentation.

The reference converts keyframes with ``cv::cvtColor(color, CV_BGR2Lab)`` on
8-bit images (``/root/reference/include/feature_extractor.h:129``). Two
reference quirks preserved here:

1. The image handed to the converter is **RGB-ordered** (train/test convert
   BGR->RGB right after imread, ``src/train.cpp:123``, and live Xtion frames
   arrive RGB) while the conversion code is ``BGR2Lab`` — so OpenCV treats the
   red channel as blue and vice versa. :func:`rgb_to_lab8` reproduces exactly
   that channel assignment (pass ``swap=False`` for a true RGB2Lab).
2. ``CV_BGR2Lab`` on 8-bit inputs applies the sRGB gamma (OpenCV's
   non-``L``-prefixed Lab codes are gamma-corrected) and quantizes
   ``L*255/100``, ``a+128``, ``b+128`` to uint8.

This implementation computes the D65 float pipeline and rounds; OpenCV's
fixed-point table path may differ by at most 1 LSB on a few values, which is
covered by the feature-parity tolerance tests.

Brightness augmentation mirrors ``color += a`` saturation arithmetic on
cv::Mat (``src/train.cpp:115-124``).
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV D65 RGB->XYZ matrix (modules/imgproc/src/color_lab.cpp).
_XYZ_FROM_RGB = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
_XN = 0.950456
_ZN = 1.088754


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def rgb_to_lab8(image: jnp.ndarray, swap: bool = True) -> jnp.ndarray:
    """[..., 3] uint8 -> [..., 3] uint8 Lab (L*255/100, a+128, b+128).

    With ``swap=True`` (default) channel 0 is fed to OpenCV's blue slot,
    reproducing the reference's BGR2Lab-on-RGB behavior
    (feature_extractor.h:129 applied to the RGB image of train.cpp:123).
    """
    img = image.astype(jnp.float32) / 255.0
    if swap:
        b, g, r = img[..., 0], img[..., 1], img[..., 2]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
    r, g, b = _srgb_to_linear(r), _srgb_to_linear(g), _srgb_to_linear(b)

    m = _XYZ_FROM_RGB
    x = (m[0][0] * r + m[0][1] * g + m[0][2] * b) / _XN
    y = m[1][0] * r + m[1][1] * g + m[1][2] * b
    z = (m[2][0] * r + m[2][1] * g + m[2][2] * b) / _ZN

    fy = _lab_f(y)
    l_val = jnp.where(y > 0.008856, 116.0 * fy - 16.0, 903.3 * y)
    a_val = 500.0 * (_lab_f(x) - fy)
    b_val = 200.0 * (fy - _lab_f(z))

    l8 = jnp.clip(jnp.round(l_val * 255.0 / 100.0), 0, 255)
    a8 = jnp.clip(jnp.round(a_val + 128.0), 0, 255)
    b8 = jnp.clip(jnp.round(b_val + 128.0), 0, 255)
    return jnp.stack([l8, a8, b8], axis=-1).astype(jnp.uint8)


def adjust_brightness(image: jnp.ndarray, delta: int) -> jnp.ndarray:
    """Saturating uint8 brightness shift: cv::Mat += scalar (train.cpp:124)."""
    shifted = image.astype(jnp.int16) + jnp.int16(delta)
    return jnp.clip(shifted, 0, 255).astype(jnp.uint8)


def hflip(image: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip, cv::flip(im, 1) (train.cpp:132-141)."""
    return image[..., ::-1, :] if image.ndim >= 3 else image[:, ::-1]
