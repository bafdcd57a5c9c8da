"""Tree-parallel forest training across devices.

The reference trains trees concurrently with OpenMP threads
(``/root/reference/third-party/libforest/src/learning.cpp:1046``,
``num_threads(8)`` at ``src/train.cpp:239``). Trees are embarrassingly
parallel; here each tree's device steps (sorts, segmented reductions) run on
its own accelerator, driven by host threads — the host-side level loop of one
tree overlaps with device compute of the others (threads release the GIL
while blocking on device results).

On a single-device machine this degrades gracefully to sequential training.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..models.forest import Forest, TreeArrays, build_forest
from ..train.forest_trainer import ForestTrainer, TrainerConfig


def learn_forest_parallel(
    config: TrainerConfig,
    features: np.ndarray,
    labels: np.ndarray,
    class_counts: Optional[Sequence[int]] = None,
    multi_label: Optional[bool] = None,
    devices: Optional[List] = None,
) -> Forest:
    """Train ``config.num_trees`` trees round-robin over devices."""
    devices = list(devices if devices is not None else jax.devices())
    labels = np.asarray(labels)
    if labels.ndim == 1:
        labels = labels[:, None]
    if multi_label is None:
        multi_label = labels.shape[1] > 1
    if class_counts is None:
        class_counts = [int(labels[:, l].max()) + 1 for l in range(labels.shape[1])]

    def train_one(t: int) -> TreeArrays:
        dev = devices[t % len(devices)]
        cfg_t = TrainerConfig(**{**config.__dict__, "num_trees": 1, "seed": config.seed})
        with jax.default_device(dev):
            # The per-tree RNG stream inside ForestTrainer is (seed, t); use
            # a single-tree trainer with the global tree index as its seed
            # tuple by training tree slot t via a custom stream.
            trainer = ForestTrainer(cfg_t)
            forest_t = trainer.learn(
                features,
                labels,
                class_counts=class_counts,
                multi_label=multi_label,
                progress=False,
                _tree_offset=t,
            )
        return forest_t.tree_view(0)

    with ThreadPoolExecutor(max_workers=min(len(devices), config.num_trees)) as ex:
        trees = list(ex.map(train_one, range(config.num_trees)))
    return build_forest(trees, class_counts, multi_label=multi_label)
