"""Local-map segmentation: fuse per-frame posteriors, smooth, label points.

Mirrors the map-fusion worker ``Segmenter::processMapFromQueue``
(``/root/reference/src/segmenter.cpp:518-719``):

1. per keyframe node: z-buffer-project the cloud into the stacked camera
   image (:578) and scatter-add the matching frame posteriors into per-point
   unaries (:589-616);
2. if the dense CRF is enabled (:628-658): pairwise features
   ``[xyz * dcrf_xyz_kernel ; rgb * dcrf_rgb_kernel]`` (cloud RGB in [0,1]),
   per layer a Potts CRF with ``dcrf_kernel_weight`` run for
   ``dcrf_iterations`` mean-field steps, then argmax with a ``2/C``
   confidence floor defaulting to the layer's Unknown label (:645-657);
3. otherwise plain argmax of summed unaries; all-zero rows get Unknown
   (:659-682).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fusion.projector import MultiProjector
from ..fusion.unaries import accumulate_unaries
from ..models.crf import exp_and_normalize, potts_mean_field
from ..models.lattice import build_lattice, lattice_filter, pad_lattice


@dataclass
class CrfParams:
    """resources/config.json:81-85."""

    use_dense_crf: bool = False
    xyz_kernel: float = 0.5
    rgb_kernel: float = 4.0
    kernel_weight: float = 10.0
    iterations: int = 10


@dataclass
class MapNodeFrames:
    """One keyframe node: its pose and per-camera full-res posteriors.

    ``posteriors[camera][layer]`` is an [H, W, C_l] array, or None when the
    frame's segmentation is missing (tolerated, segmenter.cpp:618-621).
    """

    pose: np.ndarray  # [4, 4] keyframe transform
    posteriors: List[Optional[List[jnp.ndarray]]]


@partial(jax.jit, static_argnames=("num_vertices", "n_iterations", "class_count", "unknown_label"))
def _crf_labels(
    unaries: jnp.ndarray,  # [N, C] accumulated log-posterior sums
    offsets: jnp.ndarray,
    barycentric: jnp.ndarray,
    blur_n1: jnp.ndarray,
    blur_n2: jnp.ndarray,
    norm: jnp.ndarray,
    weight: jnp.ndarray,
    num_vertices: int,
    n_iterations: int,
    class_count: int,
    unknown_label: int,
) -> jnp.ndarray:
    # crf.setUnaryEnergy(-unaries) (segmenter.cpp:642): energy = -unaries,
    # and potts_mean_field takes the energy.
    q = potts_mean_field(
        -unaries, offsets, barycentric, blur_n1, blur_n2, norm, weight,
        num_vertices, n_iterations,
    )
    # Confidence floor 2/C, default Unknown (segmenter.cpp:645-657).
    floor = jnp.float32(2.0 / class_count)
    max_val = jnp.max(q, axis=1)
    lbl = jnp.argmax(q, axis=1).astype(jnp.int32)
    return jnp.where(max_val > floor, lbl, jnp.int32(unknown_label))


@partial(jax.jit, static_argnames=("unknown_label",))
def _plain_labels(unaries: jnp.ndarray, unknown_label: int) -> jnp.ndarray:
    """Argmax with -1000 floor; all-zero rows -> Unknown (segmenter.cpp:659-682)."""
    max_val = jnp.max(unaries, axis=1)
    lbl = jnp.argmax(unaries, axis=1).astype(jnp.int32)
    lbl = jnp.where(max_val > -1000.0, lbl, jnp.int32(unknown_label))
    zero_sum = jnp.sum(unaries, axis=1) == 0.0
    return jnp.where(zero_sum, jnp.int32(unknown_label), lbl)


class LocalMapPipeline:
    """Fusion + smoothing for one local map."""

    def __init__(
        self,
        projector: MultiProjector,
        class_counts: Sequence[int],
        unknown_labels: Sequence[int],
        crf: CrfParams = CrfParams(),
    ):
        self.projector = projector
        self.class_counts = [int(c) for c in class_counts]
        self.unknown_labels = [int(u) for u in unknown_labels]
        self.crf = crf

    # ------------------------------------------------------------------
    def fuse_unaries(
        self,
        cloud_points: np.ndarray,  # [N, 3]
        nodes: Sequence[MapNodeFrames],
    ) -> List[jnp.ndarray]:
        """Per-layer [N, C_l] unary accumulators (segmenter.cpp:561-626)."""
        n = cloud_points.shape[0]
        unaries = [
            jnp.zeros((n, c), jnp.float32) for c in self.class_counts
        ]
        h = self.projector.height
        for node in nodes:
            _, index_image = self.projector.project(cloud_points, node.pose)
            for cam, layers in enumerate(node.posteriors):
                if layers is None:
                    continue  # missing frame: skip (segmenter.cpp:618-621)
                cam_idx = index_image[cam * h : (cam + 1) * h]
                for li, post in enumerate(layers):
                    unaries[li] = accumulate_unaries(
                        unaries[li], jnp.asarray(post), cam_idx, n
                    )
        return unaries

    def label_map(
        self,
        cloud_points: np.ndarray,  # [N, 3]
        cloud_rgb: Optional[np.ndarray],  # [N, 3] in [0, 1] (fps_mapper style)
        unaries: Sequence[jnp.ndarray],
    ) -> List[np.ndarray]:
        """Per-layer uint8 point labels (segmenter.cpp:627-682)."""
        result: List[np.ndarray] = []
        if self.crf.use_dense_crf:
            if cloud_rgb is None:
                raise ValueError("dense CRF smoothing needs cloud RGB")
            feats = np.concatenate(
                [
                    np.asarray(cloud_points, np.float32) * self.crf.xyz_kernel,
                    np.asarray(cloud_rgb, np.float32) * self.crf.rgb_kernel,
                ],
                axis=1,
            )  # [N, 6] (segmenter.cpp:629-637)
            # Bucket the vertex count so repeated maps reuse the compiled
            # mean-field (M varies per map; static shapes would recompile).
            lattice = pad_lattice(build_lattice(feats))
            offsets = jnp.asarray(lattice.offsets)
            bary = jnp.asarray(lattice.barycentric)
            n1 = jnp.asarray(lattice.blur_n1)
            n2 = jnp.asarray(lattice.blur_n2)
            ones = jnp.ones((feats.shape[0], 1), jnp.float32)
            raw = lattice_filter(ones, offsets, bary, n1, n2, lattice.num_vertices)[
                :, 0
            ]
            norm = 1.0 / jnp.sqrt(raw + 1e-20)  # symmetric (pairwise.cpp:54-56)
            for li, unary in enumerate(unaries):
                lbl = _crf_labels(
                    unary, offsets, bary, n1, n2, norm,
                    jnp.float32(self.crf.kernel_weight),
                    lattice.num_vertices,
                    self.crf.iterations,
                    self.class_counts[li],
                    self.unknown_labels[li],
                )
                result.append(np.asarray(lbl).astype(np.uint8))
        else:
            for li, unary in enumerate(unaries):
                lbl = _plain_labels(unary, self.unknown_labels[li])
                result.append(np.asarray(lbl).astype(np.uint8))
        return result

    def run(
        self,
        cloud_points: np.ndarray,
        cloud_rgb: Optional[np.ndarray],
        nodes: Sequence[MapNodeFrames],
    ) -> List[np.ndarray]:
        unaries = self.fuse_unaries(cloud_points, nodes)
        return self.label_map(cloud_points, cloud_rgb, unaries)
