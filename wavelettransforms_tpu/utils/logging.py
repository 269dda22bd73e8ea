"""CSV logging with the reference's exact schemas.

Byte-compatible with the reference's artifacts so results diff cleanly:
  * per-layer log.csv   (/root/reference/ResNet/utils.py:41-65, schema :55-58)
  * experiment_log.csv  (/root/reference/ResNet/utils.py:104-145, schema :127-128)
  * thread-safe logging via a queue-drained worker
    (/root/reference/ResNet/main_pruning.py:104-115)
  * run GUIDs + output-dir naming (/root/reference/ResNet/main_pruning.py:169,
    utils.py:148-162)
"""
from __future__ import annotations

import csv
import os
import queue
import threading

LAYER_LOG_FIELDS = [
    "GUID", "Wavelet", "Level", "Threshold", "DWT Phase",
    "Original Parameter Count", "Non-zero Params", "Total Pruned Count",
    "Layer Name",
]

EXPERIMENT_LOG_FIELDS = [
    "GUID", "Wavelet", "Level", "Threshold", "Phase",
    "Total Pruned Count", "Total Non-Zero Params", "Model Path",
]


def new_guid() -> str:
    return os.urandom(4).hex()


def pruned_instance_path(output_dir: str, wavelet: str, threshold: float,
                         level: int, guid: str, phase_dir: str) -> str:
    """<output_dir>/<wavelet>_threshold-<t>_level-<l>_guid-<g4>/<phase>_pruned
    (naming parity: /root/reference/ResNet/utils.py:148-162)."""
    name = f"{wavelet}_threshold-{threshold}_level-{level}_guid-{guid[:4]}"
    path = os.path.join(output_dir, name, f"{phase_dir}_pruned")
    os.makedirs(path, exist_ok=True)
    return path


def setup_csv_writer(file_path: str, mode: str = "w"):
    file_exists = os.path.isfile(file_path)
    f = open(file_path, mode=mode, newline="")
    writer = csv.DictWriter(f, fieldnames=LAYER_LOG_FIELDS)
    if mode == "w" or (mode == "a" and not file_exists):
        writer.writeheader()
    return writer, f


def log_pruning_details(writer, guid, wavelet, level, threshold, phase,
                        original_param_count, non_zero_params,
                        total_pruned_count, layer_name):
    writer.writerow({
        "GUID": guid, "Wavelet": wavelet, "Level": level,
        "Threshold": threshold, "DWT Phase": phase,
        "Original Parameter Count": original_param_count,
        "Non-zero Params": non_zero_params,
        "Total Pruned Count": total_pruned_count,
        "Layer Name": layer_name,
    })


def write_layer_log(path: str, stats, guid: str):
    """Dump a PruneStats to log.csv (one row per layer)."""
    writer, f = setup_csv_writer(path, "w")
    try:
        for l in stats.layers:
            log_pruning_details(
                writer, guid, stats.wavelet, stats.level, stats.threshold,
                stats.phase, l.original_param_count, l.non_zero_params,
                l.pruned_count, l.layer_name)
    finally:
        f.close()
    return path


def read_layer_log(path: str):
    """Read a selective log.csv back into (layer->original_count,
    layer->pruned_count, global fraction) — the coupling contract random and
    min-weight pruning consume (/root/reference/ResNet/min_weight_pruning.py:42-63,
    random_pruning.py:40-47)."""
    originals, pruned = {}, {}
    with open(path) as f:
        for row in csv.DictReader(f):
            name = row["Layer Name"]
            originals[name] = int(row["Original Parameter Count"])
            pruned[name] = int(row["Total Pruned Count"])
    total = sum(originals.values())
    frac = sum(pruned.values()) / total if total else 0.0
    return originals, pruned, frac


def append_to_experiment_log(file_path: str, guid, wavelet, level, threshold,
                             phase, total_pruned_count, total_non_zero_params,
                             model_path):
    file_exists = os.path.isfile(file_path)
    with open(file_path, mode="a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=EXPERIMENT_LOG_FIELDS)
        if not file_exists:
            writer.writeheader()
        writer.writerow({
            "GUID": guid, "Wavelet": wavelet, "Level": level,
            "Threshold": threshold, "Phase": phase,
            "Total Pruned Count": total_pruned_count,
            "Total Non-Zero Params": total_non_zero_params,
            "Model Path": model_path,
        })


class LogWorker:
    """Queue-drained single-writer thread for the experiment log — the
    reference's thread-safe CSV pattern (/root/reference/ResNet/main_pruning.py:104-115)."""

    def __init__(self, csv_path: str):
        self.csv_path = csv_path
        self.queue: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            entry = self.queue.get()
            if entry is None:
                break
            append_to_experiment_log(self.csv_path, *entry)
            self.queue.task_done()

    def put(self, *entry):
        self.queue.put(tuple(entry))

    def close(self):
        self.queue.put(None)
        self._thread.join()
