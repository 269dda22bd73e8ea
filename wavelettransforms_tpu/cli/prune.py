"""Pruning experiment CLI — reference-parity orchestrator.

Mirrors /root/reference/ResNet/main_pruning.py: loads a pretrained HF
checkpoint, runs selective (DWT) pruning, then random and min-weight pruning
at the matched budget in parallel threads with a queue-drained experiment
log, saving three comparable checkpoints.

    python -m wavelettransforms_tpu.cli.prune \
        --model_path=... --wavelet=bior4.4 --level=5 --threshold=0.5

Flag parity: model_path/config_path/csv_path/wavelet/level/threshold/
output_dir (main_pruning.py:83-102); threshold in [0,1] is converted to a
percentile *100 for the DWT phase (:186).
"""
from __future__ import annotations

import os
import threading

import numpy as np
from absl import app, flags, logging as absl_logging

from ..models import (conv_weight_names, load_config, load_torch_state,
                      save_torch_state, torch_layer_name)
from ..prune import min_weight_pruning, random_pruning, wavelet_pruning
from ..utils.logging import (LogWorker, new_guid, pruned_instance_path,
                             write_layer_log)
from ..wavelets import REFERENCE_WAVELETS

FLAGS = flags.FLAGS

flags.DEFINE_string("model_path", None,
                    "Path to the pre-trained model checkpoint directory")
flags.DEFINE_string("config_path", None,
                    "Path to the model configuration (defaults to model_path)")
flags.DEFINE_string("csv_path", "experiment_log.csv",
                    "Path to the CSV experiment log file")
flags.DEFINE_enum("wavelet", "bior4.4", REFERENCE_WAVELETS,
                  "Type of discrete wavelet to use for DWT.")
flags.DEFINE_integer("level", 1,
                     "Level of decomposition for the wavelet transform")
flags.DEFINE_float("threshold", 0.1,
                   "Threshold value (0.0 to 1.0): DWT percentile / min-weight "
                   "prune fraction")
flags.DEFINE_string("output_dir", "SavedModels",
                    "Directory to save the pruned models")
flags.DEFINE_string("mode", "periodization", "Wavelet boundary mode")
flags.DEFINE_integer("seed", 0, "Random-pruning seed")


def run_pruning_experiment(model_path: str, wavelet: str, level: int,
                           threshold: float, csv_path: str, output_dir: str,
                           config_path: str | None = None,
                           mode: str = "periodization", seed: int = 0):
    """The full three-method experiment; returns dict of phase->stats."""
    state = load_torch_state(model_path)
    try:
        config = load_config(config_path or model_path)
    except FileNotFoundError:
        config = None
    guid = new_guid()
    absl_logging.info("Generated GUID: %s", guid)

    convs = {n: state[n] for n in conv_weight_names(state)}
    log_worker = LogWorker(csv_path)
    results = {}

    # --- Selective (DWT) phase -------------------------------------------
    sel_params, sel_stats = wavelet_pruning(
        convs, wavelet, level, threshold * 100.0, mode=mode,
        threshold=threshold)
    # rename layers to module names for log parity (strip .weight)
    for l in sel_stats.layers:
        l.layer_name = torch_layer_name(l.layer_name)
    sel_dir = pruned_instance_path(output_dir, wavelet, threshold, level,
                                   guid, "selective")
    sel_state = dict(state)
    sel_state.update({k: np.asarray(v) for k, v in sel_params.items()})
    save_torch_state(sel_state, sel_dir, config)
    selective_log_path = write_layer_log(
        os.path.join(sel_dir, "log.csv"), sel_stats, guid)
    log_worker.put(guid, wavelet, level, threshold, "selective",
                   sel_stats.total_pruned, sel_stats.total_non_zero, sel_dir)
    results["selective"] = sel_stats
    absl_logging.info("Selective pruning done: %.2f%% pruned (log: %s)",
                      100 * sel_stats.prune_fraction, selective_log_path)

    # --- Random + min-weight at the matched budget, in parallel ----------
    def run_random():
        params, stats = random_pruning(convs, sel_stats, seed=seed)
        d = pruned_instance_path(output_dir, wavelet, threshold, level,
                                 guid, "random")
        st = dict(state)
        st.update({k: np.asarray(v) for k, v in params.items()})
        save_torch_state(st, d, config)
        write_layer_log(os.path.join(d, "log.csv"), stats, guid)
        log_worker.put(guid, wavelet, level, threshold, "random",
                       stats.total_pruned, stats.total_non_zero, d)
        results["random"] = stats

    def run_min():
        params, stats = min_weight_pruning(convs, sel_stats)
        d = pruned_instance_path(output_dir, wavelet, threshold, level,
                                 guid, "min")
        st = dict(state)
        st.update({k: np.asarray(v) for k, v in params.items()})
        save_torch_state(st, d, config)
        write_layer_log(os.path.join(d, "log.csv"), stats, guid)
        log_worker.put(guid, wavelet, level, threshold, "min",
                       stats.total_pruned, stats.total_non_zero, d)
        results["min"] = stats

    # Per-thread exception isolation (reference threaded_pruning,
    # /root/reference/ResNet/main_pruning.py:118-127): a baseline pruner
    # failing must not silently yield an experiment with a missing
    # checkpoint.
    errors: dict[str, BaseException] = {}

    def isolated(name, fn):
        def run():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — must surface anything
                absl_logging.error("Error in %s pruning: %s", name, e)
                errors[name] = e
        return run

    threads = [threading.Thread(target=isolated("random", run_random)),
               threading.Thread(target=isolated("min", run_min))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    log_worker.close()
    if errors:
        raise RuntimeError(
            "pruning thread(s) failed: "
            + "; ".join(f"{k}: {v!r}" for k, v in sorted(errors.items())))
    absl_logging.info("All pruning methods completed successfully.")
    return results, guid


def main(argv):
    del argv
    if not FLAGS.model_path or not os.path.isdir(FLAGS.model_path):
        raise ValueError(
            f"Provided model path {FLAGS.model_path!r} is not a valid "
            "directory.")
    run_pruning_experiment(
        FLAGS.model_path, FLAGS.wavelet, FLAGS.level, FLAGS.threshold,
        FLAGS.csv_path, FLAGS.output_dir, FLAGS.config_path, FLAGS.mode,
        FLAGS.seed)


if __name__ == "__main__":
    app.run(main)
