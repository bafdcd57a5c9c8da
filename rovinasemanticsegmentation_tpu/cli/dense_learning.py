"""CRF parameter-learning demo (parity with densecrf's dense_learning example).

Usage: python -m rovinasemanticsegmentation_tpu.cli.dense_learning \
           <image.ppm> <annotation.ppm> <output.ppm>

Reproduces ``/root/reference/third-party/densecrf/examples/dense_learning.cpp``:
M = 4 labels from the annotation's first-appearance colors, a trainable
logistic unary over ``[r, g, b, 1]`` color features (random init
``0.01 * (1 - 2u)``), a grid Gaussian Potts term (sx = sy = 3) plus an
appearance bilateral term (80, 80, 13, 13, 13), the IntersectionOverUnion
objective over 5 mean-field iterations, and the reference's THREE
optimization phases (dense_learning.cpp:146-175):

1. unary parameters only;
2. unary + pairwise (compatibility) weights;
3. full model — the bilateral kernel's feature transform (FULL d x d
   matrix, ``FullKernelCrfLearner``) with the Gaussian term held fixed.

Deviations, by design: the reference's MatrixCompatibility(Identity) on the
bilateral term is represented as a learnable Potts weight initialized to -1
(identity compatibility adds ``+Q`` where Potts adds ``-w Q``), and phase 3
learns the kernel transform with the phase-2 unary/weights frozen (the
reference re-optimizes everything jointly; the learned-parameter SHAPES
match pairwise.cpp:232-254). Each phase must improve the objective.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..models.crf_learning import (
    FullKernelCrfLearner,
    LearnablePotts,
    LogisticUnaryEnergy,
    intersection_over_union,
    mean_field_marginals,
)
from ..utils.imageio import load_ppm, save_ppm
from .dense_inference import colorize

M = 4  # dense_learning.cpp:92
NIT = 5  # dense_learning.cpp:143


def labeling_from_annotation(anno: np.ndarray, max_labels: int) -> np.ndarray:
    """First-appearance color -> label id, 0 -> -1 (common.cpp getLabeling)."""
    packed = (
        anno[..., 0].astype(np.int32)
        | (anno[..., 1].astype(np.int32) << 8)
        | (anno[..., 2].astype(np.int32) << 16)
    ).reshape(-1)
    colors = {}
    labels = np.full(packed.shape, -1, np.int32)
    for i, c in enumerate(packed):
        c = int(c)
        if c == 0:
            continue
        if c not in colors:
            if len(colors) >= max_labels:
                continue
            colors[c] = len(colors)
        labels[i] = colors[c]
    return labels


def run(
    image_path: str,
    anno_path: str,
    out_path: str,
    seed: int = 0,
    scale: int = 1,
):
    im = load_ppm(image_path)
    anno = load_ppm(anno_path)
    if scale > 1:
        # Demo-speed knob: nearest-neighbor downscale (annotation colors
        # must stay exact class colors; the reference runs full-res).
        im = im[::scale, ::scale]
        anno = anno[::scale, ::scale]
    h, w = im.shape[:2]
    n = h * w
    gt = labeling_from_annotation(anno, M)

    # Logistic color features [r, g, b, 1] (dense_learning.cpp:115-120).
    feats_u = np.concatenate(
        [im.reshape(-1, 3).astype(np.float32) / 255.0, np.ones((n, 1), np.float32)],
        axis=1,
    )
    rng = np.random.default_rng(seed)
    l0 = (0.01 * (1.0 - 2.0 * rng.random((M, 4)))).astype(np.float32)
    unary_energy = LogisticUnaryEnergy(l0, feats_u)

    # Pairwise terms (dense_learning.cpp:128-133).
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    gauss_feats = np.stack([xs.ravel() / 3.0, ys.ravel() / 3.0], axis=1).astype(
        np.float32
    )
    c = im.reshape(-1, 3).astype(np.float32)
    bilateral_base = np.stack(
        [xs.ravel(), ys.ravel(), c[:, 0], c[:, 1], c[:, 2]], axis=1
    ).astype(np.float32)
    bilateral_scale = np.array([1 / 80.0, 1 / 80.0, 1 / 13.0, 1 / 13.0, 1 / 13.0])
    gauss = LearnablePotts.build(gauss_feats)
    bilateral = LearnablePotts.build(
        (bilateral_base * bilateral_scale[None, :]).astype(np.float32)
    )
    gt_j = jnp.asarray(gt)

    def objective(l_params, weights):
        unary = unary_energy.get(l_params)
        q = mean_field_marginals(unary, [gauss, bilateral], weights, NIT)
        return intersection_over_union(q, gt_j)

    def lbfgs(fun_grad, x0, max_iter):
        from scipy.optimize import minimize

        return minimize(
            fun_grad, x0, jac=True, method="L-BFGS-B",
            options={"maxiter": max_iter},
        ).x

    # Identity MatrixCompatibility == Potts weight -1 (see module docstring).
    weights = [np.float32(1.0), np.float32(-1.0)]
    l_params = l0
    history = []

    # Phase 1: unary only (dense_learning.cpp learning_params row 1).
    vg1 = jax.jit(
        jax.value_and_grad(
            lambda l: -objective(l, [jnp.float32(weights[0]), jnp.float32(weights[1])])
        )
    )

    def f1(x):
        v, g = vg1(jnp.asarray(x.reshape(M, 4), jnp.float32))
        return float(v), np.asarray(g, np.float64).ravel()

    l_params = lbfgs(f1, np.asarray(l_params, np.float64).ravel(), 12).reshape(M, 4)
    history.append(float(objective(jnp.asarray(l_params, jnp.float32),
                                   [jnp.float32(w) for w in weights])))
    print(f"phase 1 (unary):            IoU objective = {history[-1]:.4f}")

    # Phase 2: unary + pairwise weights.
    vg2 = jax.jit(
        jax.value_and_grad(
            lambda p: -objective(p["l"], [p["w0"], p["w1"]])
        )
    )

    def f2(x):
        p = {
            "l": jnp.asarray(x[:-2].reshape(M, 4), jnp.float32),
            "w0": jnp.float32(x[-2]),
            "w1": jnp.float32(x[-1]),
        }
        v, g = vg2(p)
        return float(v), np.concatenate(
            [np.asarray(g["l"], np.float64).ravel(),
             [float(g["w0"]), float(g["w1"])]]
        )

    x = lbfgs(
        f2,
        np.concatenate([np.asarray(l_params, np.float64).ravel(), weights]),
        12,
    )
    l_params, weights = x[:-2].reshape(M, 4), [x[-2], x[-1]]
    history.append(float(objective(jnp.asarray(l_params, jnp.float32),
                                   [jnp.float32(w) for w in weights])))
    print(f"phase 2 (unary + pairwise): IoU objective = {history[-1]:.4f}")

    # Phase 3: bilateral kernel transform (FULL d x d), Gaussian fixed.
    unary_now = np.asarray(unary_energy.get(jnp.asarray(l_params, jnp.float32)))
    learner = FullKernelCrfLearner(
        unary_now,
        bilateral_base,
        gt,
        n_iterations=NIT,
        objective=intersection_over_union,
        extra_potentials=[gauss],
        extra_weights=[weights[0]],
    )
    kw, kmat, obj3 = learner.fit(
        float(weights[1]),  # Potts weight of the kernel term (same sign
        # convention as mean_field_marginals: t = -unary + w*filtered)
        np.diag(bilateral_scale),
        max_iter=6,
    )
    history.append(obj3)
    print(f"phase 3 (full kernel):      IoU objective = {history[-1]:.4f}")
    print("unary parameters:", np.asarray(l_params).ravel())
    print("pairwise weights:", [float(v) for v in weights])
    print("kernel matrix diag:", np.diag(kmat))

    # MAP with the learned model (kernel transform applied to the features).
    bilateral_learned = LearnablePotts.build(
        (bilateral_base @ np.asarray(kmat, np.float32).T).astype(np.float32)
    )
    q = mean_field_marginals(
        unary_energy.get(jnp.asarray(l_params, jnp.float32)),
        [gauss, bilateral_learned],
        [jnp.float32(weights[0]), jnp.float32(kw)],
        NIT,
    )
    labels = np.asarray(jnp.argmax(q, axis=1).astype(jnp.int32))
    save_ppm(out_path, colorize(labels, anno).reshape(h, w, 3))
    return history


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    scale = 1
    for a in sys.argv[1:]:
        if a.startswith("--scale="):
            scale = int(a.split("=", 1)[1])
    if len(args) != 3:
        print(
            "Usage: dense_learning <image.ppm> <annotation.ppm> <output.ppm>"
            " [--scale=N]"
        )
        raise SystemExit(1)
    run(args[0], args[1], args[2], scale=scale)


if __name__ == "__main__":
    main()
