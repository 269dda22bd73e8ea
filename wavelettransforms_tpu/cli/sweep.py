"""Threshold-sweep driver reproducing the reference's experiment grid.

The reference ran its headline sweep over thresholds
{0, 0.236, 0.382, 0.5, 0.618, 0.786, 1} (golden-ratio ladder,
/root/reference/ResNet/main_pruning.py:60) for a fixed wavelet/level,
evaluating each of the three pruned models afterwards, and published the
aggregate as a PreliminaryResults CSV (threshold x method x metrics,
/root/reference/ResNet/testing_suite/PreliminaryResults/
Haar_Wavelet_Pruning_Metrics_Data_level_5.csv) plus an accuracy-vs-threshold
figure.  This driver runs the whole grid in one process (reusing the compiled
encode for every threshold), RESUMES an interrupted grid from
``<output_dir>/sweep_progress.json``, and emits both aggregate deliverables.

    python -m wavelettransforms_tpu.cli.sweep --model_path=... \
        --wavelet=bior4.4 --level=5 --thresholds=0,0.236,0.5 \
        --synthetic_eval=512
"""
from __future__ import annotations

import csv
import logging
import os

from absl import app, flags

from ..utils.checkpointing import SweepProgress
from .prune import run_pruning_experiment

FLAGS = flags.FLAGS

# model_path / wavelet / level / csv_path / output_dir are shared with (and
# registered by) ``cli.prune``, imported above — absl flags are process-global
# and redefining them raises DuplicateFlagError.  Only sweep-specific knobs
# are defined here.
flags.DEFINE_list("thresholds", ["0.0", "0.236", "0.382", "0.5", "0.618",
                                 "0.786", "1.0"],
                  "Comma-separated threshold grid")
flags.DEFINE_integer("synthetic_eval", 0,
                     "If >0, evaluate each pruned model on N synthetic "
                     "samples after pruning")
flags.DEFINE_string("data_path", None,
                    "Real validation data dir for post-sweep evaluation")
flags.DEFINE_boolean("resume", True,
                     "Skip thresholds recorded in sweep_progress.json")


def run_dir_for(output_dir: str, wavelet: str, t: float, level: int,
                guid: str) -> str:
    return os.path.join(
        output_dir, f"{wavelet}_threshold-{t}_level-{level}_guid-{guid[:4]}")


def write_preliminary_results(path: str, rows: list[dict]) -> None:
    """Aggregate sweep CSV with the reference's exact schema
    (PreliminaryResults/Haar_Wavelet_Pruning_Metrics_Data_level_5.csv:
    Threshold,Model,Accuracy,F1 Score,Recall,Average Loss,Sparsity), ordered
    threshold-descending / model-name-ascending like the reference.

    Synthetic-eval rows carry one extra trailing column, ``Synthetic=true``
    (accuracy NOT ImageNet-comparable — never diff those against
    BASELINE.md).  Real-data runs omit the column entirely so the file stays
    byte-compatible with the reference's exact 7-column schema."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = sorted(rows, key=lambda r: (-r["Threshold"], r["Model"]))
    fields = ["Threshold", "Model", "Accuracy", "F1 Score", "Recall",
              "Average Loss", "Sparsity"]
    if any("Synthetic" in r for r in rows):
        fields.append("Synthetic")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)


def write_sweep_plot(path: str, rows: list[dict], wavelet: str,
                     level: int, synthetic: bool = False) -> None:
    """Accuracy-vs-threshold figure (the reference's headline artifact:
    'Accuracy vs. Threshold for Selective Pruning (... Wavelet,
    Decomposition Level ...).png')."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for model, style in (("selective_pruned", "o-"), ("min_pruned", "s--"),
                         ("random_pruned", "^:")):
        pts = sorted((r["Threshold"], r["Accuracy"]) for r in rows
                     if r["Model"] == model)
        if pts:
            ax.plot([p[0] for p in pts], [p[1] for p in pts], style,
                    label=model)
    ax.set_xlabel("Threshold")
    ax.set_ylabel("Accuracy")
    title = (f"Accuracy vs. Threshold for Selective Pruning "
             f"({wavelet} Wavelet, Decomposition Level {level})")
    if synthetic:
        title += "\n[SYNTHETIC eval: random data / random-init weights — " \
                 "not ImageNet-comparable]"
    ax.set_title(title)
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def main(argv):
    del argv
    logging.basicConfig(level=logging.INFO)
    os.makedirs(FLAGS.output_dir, exist_ok=True)
    progress = SweepProgress(
        os.path.join(FLAGS.output_dir, "sweep_progress.json"))
    runs = []  # (threshold, guid)
    # The resume key carries a model identifier: two sweeps of different
    # checkpoints sharing an output_dir must not skip each other's runs.
    model_id = os.path.basename(os.path.normpath(FLAGS.model_path or ""))
    for t in FLAGS.thresholds:
        t = float(t)
        key = f"{model_id}_{FLAGS.wavelet}_l{FLAGS.level}_t{t}"
        if FLAGS.resume and progress.is_done(key):
            guid = progress.done[str(key)]
            logging.info("=== threshold %s: already done (guid %s), "
                         "skipping ===", t, guid)
            runs.append((t, guid))
            continue
        logging.info("=== threshold %s ===", t)
        results, guid = run_pruning_experiment(
            FLAGS.model_path, FLAGS.wavelet, FLAGS.level, t,
            FLAGS.csv_path, FLAGS.output_dir)
        progress.mark(key, guid)
        runs.append((t, guid))
        sel = results["selective"]
        logging.info("t=%s: selective fraction %.5f", t, sel.prune_fraction)

    if FLAGS.synthetic_eval or FLAGS.data_path:
        from ..data.imagenet import (ImageNetFlatDataset, SyntheticImageNet,
                                     batch_iterator)
        from ..eval.harness import evaluate_all

        if FLAGS.data_path:
            dataset = ImageNetFlatDataset(FLAGS.data_path)
            synthetic = False
        else:
            dataset = SyntheticImageNet(FLAGS.synthetic_eval)
            synthetic = True

        def batches():
            return batch_iterator(dataset, 64)

        agg_rows = []
        for t, guid in runs:
            run_dir = run_dir_for(FLAGS.output_dir, FLAGS.wavelet, t,
                                  FLAGS.level, guid)
            for r in evaluate_all(run_dir, batches, synthetic=synthetic):
                row = {
                    "Threshold": t, "Model": r.model_name,
                    "Accuracy": r.accuracy, "F1 Score": r.f1,
                    "Recall": r.recall, "Average Loss": r.avg_loss,
                    "Sparsity": r.sparsity,
                }
                # truth label only on synthetic rows — real-data files keep
                # the reference's exact 7-column schema
                if synthetic:
                    row["Synthetic"] = "true"
                agg_rows.append(row)

        wname = FLAGS.wavelet.capitalize()
        prelim = os.path.join(
            FLAGS.output_dir, "PreliminaryResults",
            f"{wname}_Wavelet_Pruning_Metrics_Data_level_{FLAGS.level}.csv")
        write_preliminary_results(prelim, agg_rows)
        logging.info("Aggregated sweep CSV: %s", prelim)

        plot = os.path.join(
            FLAGS.output_dir,
            f"Accuracy vs. Threshold for Selective Pruning ({wname} "
            f"Wavelet, Decomposition Level {FLAGS.level}).png")
        write_sweep_plot(plot, agg_rows, wname, FLAGS.level,
                         synthetic=synthetic)
        logging.info("Sweep figure: %s", plot)
    return 0


if __name__ == "__main__":
    app.run(main)
