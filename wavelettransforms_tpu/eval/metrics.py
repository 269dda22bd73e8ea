"""Evaluation metrics — parity with the reference's metric engine
(/root/reference/ResNet/testing_suite/eval_model.py).

accuracy / weighted F1 / weighted recall (zero_division=1) use sklearn like
the reference; CE loss is the batch-mean average; sparsity is the near-zero
(|w| < 1e-6) census over every parameter tensor with dim > 1 — note this
includes the classifier weight matrix, which is why the reference's reported
sparsities are prune_fraction * (conv params / all dim>1 params)
(e.g. 47.808% at a 50% conv budget).
"""
from __future__ import annotations

import numpy as np

NEAR_ZERO = 1e-6


def classification_metrics(all_labels, all_preds):
    from sklearn.metrics import accuracy_score, f1_score, recall_score

    accuracy = accuracy_score(all_labels, all_preds)
    f1 = f1_score(all_labels, all_preds, average="weighted")
    recall = recall_score(all_labels, all_preds, average="weighted",
                          zero_division=1)
    return float(accuracy), float(f1), float(recall)


def model_sparsity(state: dict, threshold: float = NEAR_ZERO):
    """Near-zero fraction over all dim>1 tensors (weights, not biases) —
    /root/reference/ResNet/testing_suite/eval_model.py:7-20."""
    total = 0
    near_zero = 0
    for name, p in state.items():
        arr = np.asarray(p)
        if arr.ndim > 1:
            total += arr.size
            near_zero += int(np.sum(np.abs(arr) < threshold))
    return near_zero / total if total else 0.0


def per_layer_zero_census(state: dict, threshold: float = NEAR_ZERO):
    """layer -> (near_zero, total) for dim>1 tensors
    (eval_model.py:92-96 logging)."""
    out = {}
    for name, p in state.items():
        arr = np.asarray(p)
        if arr.ndim > 1:
            out[name] = (int(np.sum(np.abs(arr) < threshold)), arr.size)
    return out


def model_size_bytes(state: dict, dense: bool = True) -> int:
    """Checkpoint size: dense bytes, or the nnz-compressed estimate
    (values + int32 indices for near-zero-pruned tensors) when dense=False.
    The reference discusses model size as a metric without implementing it
    (README.md:131-134); here it is first-class."""
    total = 0
    for p in state.values():
        arr = np.asarray(p)
        if dense or arr.ndim <= 1:
            total += arr.nbytes
        else:
            nnz = int(np.sum(np.abs(arr) >= NEAR_ZERO))
            total += nnz * (arr.itemsize + 4)
    return total


def confusion_matrix(all_labels, all_preds, num_classes: int):
    """Confusion matrix (the deprecated suite's extra metric,
    /root/reference/ResNet/testing_suite/Deprecated/eval_model.py)."""
    m = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(m, (np.asarray(all_labels), np.asarray(all_preds)), 1)
    return m
