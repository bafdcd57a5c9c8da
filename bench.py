"""Benchmark: RGB-D keyframes/sec/chip through the end-to-end pipeline.

Measures the reference's headline cost path — per-keyframe feature extraction
+ random-forest posterior prediction (the "Time per image" instrument,
``/root/reference/src/test_multi.cpp:238``) plus, when available, the
dense-CRF mean-field contribution per keyframe — on whatever accelerator JAX
exposes (the driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to the 100 kf/s/chip north star in BASELINE.md
(the reference repo publishes no numbers).
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rovinasemanticsegmentation_tpu.models.forest import random_forest
    from rovinasemanticsegmentation_tpu.features.extractor import FeatureConfig
    from rovinasemanticsegmentation_tpu.pipelines.single_frame import (
        SingleFramePipeline,
    )
    from rovinasemanticsegmentation_tpu.utils.calibration import Calibration

    rng = np.random.default_rng(0)
    h, w = 480, 640  # Xtion VGA keyframes
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    depth = rng.integers(600, 14000, (h, w)).astype(np.uint16)
    calib = Calibration(
        intrinsic=np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]]),
        rotation=np.eye(3),
        translation=np.zeros(3),
    )
    # Reference cost drivers: 4 trees, depth <= 30, 366-dim features,
    # stride-2 prediction grid (resources/config.json:37-39,87). Trained
    # trees at minSplit=50 land around tens of thousands of nodes.
    forest = random_forest(
        rng, num_trees=4, depth=30, num_features=366,
        class_counts=[8, 9], max_nodes=40001,
    )
    pipeline = SingleFramePipeline(
        FeatureConfig(), forest, stride=2, fill_value=0.0
    )

    # Warmup/compile.
    res = pipeline.run(rgb, depth, calib)
    jax.block_until_ready(res.labels)

    # Vary the frame content each iteration: the TPU runtime memoizes
    # executions with identical inputs, which would fake the throughput.
    n_iters = 20
    frames = [
        (
            np.bitwise_xor(rgb, np.uint8(i + 1)),
            np.bitwise_xor(depth, np.uint16(i + 1)),
        )
        for i in range(n_iters)
    ]
    start = time.perf_counter()
    for f_rgb, f_depth in frames:
        res = pipeline.run(f_rgb, f_depth, calib)
    jax.block_until_ready(res.labels)
    elapsed = time.perf_counter() - start
    kf_per_sec = n_iters / elapsed

    print(
        json.dumps(
            {
                "metric": "keyframes_per_sec_per_chip",
                "value": round(kf_per_sec, 3),
                "unit": "keyframes/s",
                "vs_baseline": round(kf_per_sec / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
