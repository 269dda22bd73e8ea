"""Evaluation CLI — mirrors /root/reference/ResNet/testing_suite/main.py.

    python -m wavelettransforms_tpu.cli.evaluate \
        --model_path=SavedModels/<run> --data_path=imagenet1k/val_images

Flag parity: model_path/data_path/batch_size/num_threads/timeout (:15-26);
the torch 'device' flag becomes --platform (jax backend is selected at
process start).  --synthetic N evaluates on a deterministic synthetic set
(this environment has no ImageNet), --subset_size limits real data.
"""
from __future__ import annotations

import logging
import os
import sys

from absl import app, flags

from ..data.imagenet import (ImageNetFlatDataset, SyntheticImageNet,
                             batch_iterator)
from ..eval.harness import evaluate_all

FLAGS = flags.FLAGS

flags.DEFINE_string("model_path", None, "Path to the parent model directory")
flags.DEFINE_string("data_path", "imagenet1k/data/val_images",
                    "Path to the ImageNet validation data")
flags.DEFINE_integer("batch_size", 64, "Batch size for evaluation.")
flags.DEFINE_integer("num_threads", 4,
                     "Concurrent model evaluations.")
flags.DEFINE_integer("timeout", 600,
                     "Timeout in seconds for each model evaluation")
flags.DEFINE_integer("subset_size", 0, "Evaluate only the first N samples")
flags.DEFINE_integer("synthetic", 0,
                     "Use N synthetic samples instead of --data_path")
flags.DEFINE_integer("synthetic_classes", 1000,
                     "Label space of the synthetic dataset (must not exceed "
                     "the model's num_labels)")
flags.DEFINE_string("class_index", None,
                    "Optional JSON {synset: class_index} mapping file")


def main(argv):
    del argv
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    if FLAGS.synthetic:
        dataset = SyntheticImageNet(FLAGS.synthetic,
                                    num_classes=FLAGS.synthetic_classes)
    else:
        dataset = ImageNetFlatDataset(FLAGS.data_path, FLAGS.class_index)
        dataset.validate_dataset()
        dataset.sanity_check()
    logging.info("Validation dataset size: %d", len(dataset))

    def batches_factory():
        return batch_iterator(dataset, FLAGS.batch_size,
                              FLAGS.subset_size or None)

    results = evaluate_all(FLAGS.model_path, batches_factory,
                           FLAGS.num_threads, FLAGS.timeout,
                           synthetic=bool(FLAGS.synthetic))
    logging.info("Evaluation complete for all models (%d).", len(results))
    return 0


if __name__ == "__main__":
    app.run(main)
