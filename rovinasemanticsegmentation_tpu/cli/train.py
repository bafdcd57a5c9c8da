"""Training CLI (parity with semantic_segmentation_train).

Usage: python -m rovinasemanticsegmentation_tpu.cli.train \
           --conf <config file> [--key value ...]

Reproduces ``/root/reference/src/train.cpp:35-254``: load the train split,
augment each image with brightness shifts {-20, 0, +20} x horizontal flip,
extract WITH_POSITIVE_LABEL features at ``training_sample_stride``, print the
per-layer label frequency, train the (multi-label) forest, and serialize it
to the reference ``forest.dat`` format.
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from ..features.dataset import RovinaDataset, layer_prefixes_for, model_path_for
from ..features.extractor import ExtractType, FeatureConfig, FeatureExtractor
from ..models.forest import save_forest
from ..train.forest_trainer import ForestTrainer, TrainerConfig
from ..utils.config import Config, load_config_from_argv
from ..utils.labels import RgbLabelConversion


def extract_training_data(conf: Config, verbose: bool = True):
    """Augmented feature extraction (train.cpp:105-223)."""
    import jax.numpy as jnp

    from ..ops.color import adjust_brightness, hflip

    prefixes, shared = layer_prefixes_for(conf)
    dataset = RovinaDataset(conf, "file_names_train", prefixes, load_labels=True)
    codings = {l["name"]: l["coding"] for l in conf.get_raw("color_codings")}
    converters = [RgbLabelConversion(codings[p]) for p in prefixes]
    class_counts = [c.valid_label_count for c in converters]

    extractor = FeatureExtractor(FeatureConfig.from_config(conf))
    stride = conf.get_int("training_sample_stride")

    feats: List[np.ndarray] = []
    labels: List[np.ndarray] = []
    for sample in dataset:
        for delta in (-20, 0, 20):  # train.cpp:115-117
            rgb = np.asarray(adjust_brightness(jnp.asarray(sample.rgb), delta))
            variants = [(rgb, sample.depth, sample.labels)]
            # Horizontal flip augmentation (train.cpp:132-145).
            variants.append(
                (
                    np.asarray(hflip(jnp.asarray(rgb))),
                    np.asarray(hflip(jnp.asarray(sample.depth))),
                    [np.asarray(hflip(jnp.asarray(l))) for l in sample.labels],
                )
            )
            for v_rgb, v_depth, v_labels in variants:
                batch = extractor.extract(
                    v_rgb, v_depth, sample.calibration, stride,
                    label_extraction=ExtractType.WITH_POSITIVE_LABEL,
                    labels=v_labels,
                )
                mask = np.asarray(batch.mask)
                feats.append(np.asarray(batch.features)[mask])
                labels.append(np.asarray(batch.labels)[mask])
        if verbose:
            print("x+", end="", flush=True)

    x = np.concatenate(feats, axis=0)
    y = np.concatenate(labels, axis=0).astype(np.int32)
    if verbose:
        print(f"\n{len(x)}")
        for l in range(y.shape[1]):  # label frequency print (train.cpp:150-163)
            vals, counts = np.unique(y[:, l], return_counts=True)
            for v, cnt in zip(vals, counts):
                print(f"{v}->{cnt}")
    return x, y, class_counts, shared


def main(argv=None) -> None:
    conf, _ = load_config_from_argv(sys.argv[1:] if argv is None else argv)
    x, y, class_counts, shared = extract_training_data(conf)
    trainer = ForestTrainer(TrainerConfig.from_config(conf))
    forest = trainer.learn(
        x, y, class_counts=class_counts, multi_label=shared
    )
    model_file = model_path_for(conf)
    save_forest(model_file, forest)
    print(f"Wrote forest to {model_file}")


if __name__ == "__main__":
    main()
