"""Literal scalar port of PCL's IntegralImageNormalEstimation, AVERAGE_3D_GRADIENT.

The reference consumes this estimator with ``maxDepthChangeFactor = 0.02``,
``normalSmoothingSize = 10.0`` and takes ``acos(|n_z|)`` per pixel with NaN
-> -2 (``/root/reference/include/feature_extractor.h:254-291``). PCL is not
installed in this environment and cannot be fetched (zero egress), so this
oracle is a from-scratch scalar reimplementation of the PCL 1.7
``features/include/pcl/features/impl/integral_image_normal.hpp`` pipeline,
written to its documented/known semantics:

1. ``initAverage3DGradientMethod``: central differences of the organized
   cloud, ``diff_x = p(x+1, y) - p(x-1, y)``, ``diff_y = p(x, y+1) -
   p(x, y-1)``, computed for interior pixels; border rows/cols hold zeros.
   No 0.5 factor (the normal is normalized later, so scale cancels).
2. Depth-change map: for each pixel, compare z against the right and lower
   neighbor with threshold ``max_depth_change_factor * (|z| + 1) * 2``;
   non-finite depths count as changes; BOTH pixels of an offending pair are
   marked.
3. Distance map: two-pass (forward/backward) CHAMFER transform with step
   costs 1.0 (axial) and 1.4 (diagonal) from the change pixels — NOT an
   exact Manhattan distance.
4. Per-pixel smoothing = ``min(distance_map, normal_smoothing_size)``;
   pixels with ``smoothing <= 2`` or non-finite depth get NaN normals. The
   averaging window is ``rect = int(smoothing)`` wide (truncation!), spanning
   ``[pos - rect/2, pos - rect/2 + rect)`` in each axis — an EVEN-width,
   right-open window for even rects, not a symmetric radius.
5. A frame of ``border = int(normal_smoothing_size)`` pixels around the
   image is skipped entirely (NaN normals).
6. normal ~ cross(gradient_y_sum, gradient_x_sum) of the windowed sums of
   finite central differences; windows with zero finite elements in either
   gradient, or a zero-length cross product, give NaN.

Where this oracle and PCL could still disagree is exactly the corners the
tests pin (change-map neighbor marking, chamfer passes, rect truncation,
border skip) — the production kernel (ops/normals.py) is written to THIS
spec, so oracle and kernel fail together, loudly, if the spec is wrong.
"""

import math

import numpy as np


def depth_change_map(z, max_depth_change_factor):
    """Step 2: bool [H, W], True where a depth change is marked."""
    h, w = z.shape
    change = np.zeros((h, w), bool)
    for y in range(h):
        for x in range(w):
            d = z[y, x]
            thresh = max_depth_change_factor * (abs(d) + 1.0) * 2.0
            if x + 1 < w:
                dr = z[y, x + 1]
                if not np.isfinite(d) or not np.isfinite(dr) or abs(d - dr) > thresh:
                    change[y, x] = True
                    change[y, x + 1] = True
            if y + 1 < h:
                dd = z[y + 1, x]
                if not np.isfinite(d) or not np.isfinite(dd) or abs(d - dd) > thresh:
                    change[y, x] = True
                    change[y + 1, x] = True
    return change


def chamfer_distance_map(change):
    """Step 3: float [H, W] two-pass chamfer (1.0 / 1.4) distance."""
    h, w = change.shape
    big = float(h + w)
    d = np.where(change, 0.0, big).astype(np.float64)
    # Forward pass (top-left to bottom-right).
    for y in range(1, h):
        for x in range(1, w - 1):
            v = min(
                d[y - 1, x - 1] + 1.4,
                d[y - 1, x] + 1.0,
                d[y - 1, x + 1] + 1.4,
                d[y, x - 1] + 1.0,
            )
            if v < d[y, x]:
                d[y, x] = v
    # Backward pass (bottom-right to top-left).
    for y in range(h - 2, -1, -1):
        for x in range(w - 2, 0, -1):
            v = min(
                d[y + 1, x + 1] + 1.4,
                d[y + 1, x] + 1.0,
                d[y + 1, x - 1] + 1.4,
                d[y, x + 1] + 1.0,
            )
            if v < d[y, x]:
                d[y, x] = v
    return d


def gradients(points):
    """Step 1: diff_x, diff_y [H, W, 3] float64, zeros at the border."""
    h, w = points.shape[:2]
    p = points.astype(np.float64)
    dx = np.zeros((h, w, 3))
    dy = np.zeros((h, w, 3))
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            dx[y, x] = p[y, x + 1] - p[y, x - 1]
            dy[y, x] = p[y + 1, x] - p[y - 1, x]
    return dx, dy


def normal_angles_oracle(
    points, max_depth_change_factor=0.02, normal_smoothing_size=10.0
):
    """acos(|n_z|) per pixel, NaN -> -2 (feature_extractor.h:269-291)."""
    h, w = points.shape[:2]
    z = points[..., 2].astype(np.float64)
    change = depth_change_map(z, max_depth_change_factor)
    dist = chamfer_distance_map(change)
    dx, dy = gradients(points)
    fin_x = np.isfinite(dx).all(axis=2)
    fin_y = np.isfinite(dy).all(axis=2)

    out = np.full((h, w), -2.0)
    border = int(normal_smoothing_size)
    for y in range(border, h - border):
        for x in range(border, w - border):
            if not np.isfinite(z[y, x]):
                continue
            smoothing = min(dist[y, x], normal_smoothing_size)
            if smoothing <= 2.0:
                continue
            rect = int(smoothing)
            y0 = y - rect // 2
            x0 = x - rect // 2
            sx = np.zeros(3)
            sy = np.zeros(3)
            cx = cy = 0
            for yy in range(y0, y0 + rect):
                for xx in range(x0, x0 + rect):
                    if fin_x[yy, xx]:
                        sx += np.nan_to_num(dx[yy, xx])
                        cx += 1
                    if fin_y[yy, xx]:
                        sy += np.nan_to_num(dy[yy, xx])
                        cy += 1
            if cx == 0 or cy == 0:
                continue
            n = np.cross(sy, sx)
            length = np.dot(n, n)
            if length == 0.0:
                continue
            nz = abs(n[2]) / math.sqrt(length)
            out[y, x] = math.acos(min(max(nz, 0.0), 1.0))
    return out
