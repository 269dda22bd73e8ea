"""Threshold-sweep driver reproducing the reference's experiment grid.

The reference ran its headline sweep over thresholds
{0, 0.236, 0.382, 0.5, 0.618, 0.786, 1} (golden-ratio ladder,
/root/reference/ResNet/main_pruning.py:60) for a fixed wavelet/level,
evaluating each of the three pruned models afterwards.  This driver runs the
whole grid in one process, reusing the compiled encode for every threshold.

    python -m wavelettransforms_tpu.cli.sweep --model_path=... \
        --wavelet=bior4.4 --level=5 --thresholds=0,0.236,0.5 \
        --synthetic_eval=512
"""
from __future__ import annotations

import logging

from absl import app, flags

from ..wavelets import REFERENCE_WAVELETS
from .prune import run_pruning_experiment

FLAGS = flags.FLAGS

flags.DEFINE_string("model_path", None, "Pretrained checkpoint directory")
flags.DEFINE_enum("wavelet", "bior4.4", REFERENCE_WAVELETS, "Wavelet")
flags.DEFINE_integer("level", 5, "Decomposition level")
flags.DEFINE_list("thresholds", ["0.0", "0.236", "0.382", "0.5", "0.618",
                                 "0.786", "1.0"],
                  "Comma-separated threshold grid")
flags.DEFINE_string("csv_path", "experiment_log.csv", "Experiment log CSV")
flags.DEFINE_string("output_dir", "SavedModels", "Output directory")
flags.DEFINE_integer("synthetic_eval", 0,
                     "If >0, evaluate each pruned model on N synthetic "
                     "samples after pruning")
flags.DEFINE_string("data_path", None,
                    "Real validation data dir for post-sweep evaluation")


def main(argv):
    del argv
    logging.basicConfig(level=logging.INFO)
    runs = []
    for t in FLAGS.thresholds:
        t = float(t)
        logging.info("=== threshold %s ===", t)
        results, guid = run_pruning_experiment(
            FLAGS.model_path, FLAGS.wavelet, FLAGS.level, t,
            FLAGS.csv_path, FLAGS.output_dir)
        runs.append((t, guid, results))
        sel = results["selective"]
        logging.info("t=%s: selective fraction %.5f", t, sel.prune_fraction)

    if FLAGS.synthetic_eval or FLAGS.data_path:
        from ..data.imagenet import (ImageNetFlatDataset, SyntheticImageNet,
                                     batch_iterator)
        from ..eval.harness import evaluate_all
        import os

        if FLAGS.data_path:
            dataset = ImageNetFlatDataset(FLAGS.data_path)
        else:
            dataset = SyntheticImageNet(FLAGS.synthetic_eval)

        def batches():
            return batch_iterator(dataset, 64)

        for t, guid, _ in runs:
            run_dir = os.path.join(
                FLAGS.output_dir,
                f"{FLAGS.wavelet}_threshold-{t}_level-{FLAGS.level}"
                f"_guid-{guid[:4]}")
            evaluate_all(run_dir, batches)
    return 0


if __name__ == "__main__":
    app.run(main)
